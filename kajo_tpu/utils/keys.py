"""Non-blocking terminal key polling for the progressive render loop.

TPU-headless translation of the reference preview's interactive keys
(/root/reference/renderer/Preview.cpp:216-234): ESC stops the render (the
accumulated image is still saved on the way out) and s / Ctrl-S saves the
current accumulation immediately. The reference polls SDL window events once
per preview frame; with no window we put the controlling terminal in cbreak
mode and drain stdin between passes — zero cost while no key is pressed.

Degrades to a no-op (poll() always returns []) when stdin is not a TTY
(pipes, CI, driver harnesses), so scripted runs behave exactly as before.
"""

from __future__ import annotations

import contextlib
import os
import select
import sys

ESC = "\x1b"
CTRL_S = "\x13"


@contextlib.contextmanager
def key_poller():
    """Context manager yielding ``poll() -> list[str]`` of keys pressed since
    the last call. Restores the terminal state on exit."""
    fd = None
    old = None
    try:
        if sys.stdin is not None and sys.stdin.isatty():
            import termios
            import tty

            fd = sys.stdin.fileno()
            old = termios.tcgetattr(fd)
            tty.setcbreak(fd)
    except Exception:
        fd = None

    def poll():
        if fd is None:
            return []
        chars = []
        try:
            while select.select([fd], [], [], 0)[0]:
                c = os.read(fd, 1)
                if not c:
                    break
                chars.append(c.decode(errors="ignore"))
        except Exception:
            pass
        return chars

    try:
        yield poll
    finally:
        if fd is not None and old is not None:
            import termios

            termios.tcsetattr(fd, termios.TCSADRAIN, old)
