"""Lockstep replay of the reference estimator from an RNG tape.

Consumes a tape produced by tools/tape_driver (the reference's own
Raytracer/Shader running with every Random::generate() vec4 recorded) and
recomputes each sample's radiance with OUR estimator math and OUR trace —
a scalar re-derivation of the spec in models/integrator.py, consuming the
reference's uniforms in the reference's draw order (SURVEY.md §3.4 /
cpu/Shader.cpp:113-215):

    shade():   RR coin | transparency coin | [diffuse coin]
    shadeWithBSDF():  per emissive non-self sphere: 1 light-sample draw,
                      then 1 BSDF draw (Lambert/Phong; deltas draw nothing)

Per-sample radiance agreement (typically ~1e-5 relative) validates the MIS
weights, RR factors and lottery divisions *exactly*, with no Monte-Carlo
noise floor — the assurance statistical image comparisons cannot give
(SURVEY §7.4 hard-part 2b).
"""

from __future__ import annotations

import numpy as np

DEPTH_LIMIT = 8
EPS = np.float32(1e-3)
PI = np.float32(np.pi)
ALL, NONEMISSIVE = 0, 1


def parse_tape(text):
    """-> list of (ray[6], uniforms [n,4], radiance[4]) per sample."""
    samples = []
    ray, us, rad = None, [], None
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "S":
            ray = np.array(parts[1:7], np.float32)
            us = []
        elif parts[0] == "U":
            us.append(np.array(parts[1:5], np.float32))
        elif parts[0] == "R":
            rad = np.array(parts[1:5], np.float32)
            samples.append((ray, np.array(us, np.float32).reshape(-1, 4), rad))
    return samples


class _Tape:
    def __init__(self, uniforms):
        self.u = uniforms
        self.i = 0

    def next(self):
        v = self.u[self.i]
        self.i += 1
        return v


def _normalize(v):
    return v / np.float32(np.linalg.norm(v))


def _reflect(v, n):
    return v - np.float32(2.0) * np.float32(np.dot(n, v)) * n


def _solid_angle(center, radius, position):
    dist = np.float32(np.linalg.norm(center - position))
    if dist < radius:
        return np.float32(4.0) * PI
    return np.float32(2.0) * PI * (np.float32(1.0) - np.cos(np.arcsin(np.float32(radius / dist))))


class LockstepIntegrator:
    """Scalar reference-order estimator over our scene/trace."""

    def __init__(self, scene):
        import jax

        from kajo_tpu.ops import geometry

        self.prep = geometry.prepare_scene(scene)
        self._trace = jax.jit(lambda o, d: geometry.trace(self.prep, o, d))
        p = self.prep
        self.background = np.asarray(p.background, np.float32)
        m = p.materials
        self.diffuse = np.asarray(m.diffuse, np.float32)
        self.specular = np.asarray(m.specular, np.float32)
        self.emission = np.asarray(m.emission, np.float32)
        self.transparency = np.asarray(m.transparency, np.float32)
        self.exponent = np.asarray(m.specular_exponent, np.float32)
        self.ior = np.asarray(m.refractive_index, np.float32)
        self.light_obj = np.asarray(p.light_obj, np.int32)
        self.light_center = np.asarray(p.light_center, np.float32)
        self.light_radius = np.asarray(p.light_radius, np.float32)
        self.light_emission = np.asarray(p.light_emission, np.float32)

    def trace1(self, o, d):
        h = self._trace(np.asarray(o, np.float32)[None], np.asarray(d, np.float32)[None])
        return dict(
            obj=int(h.obj[0]),
            position=np.asarray(h.position[0], np.float32),
            normal=np.asarray(h.normal[0], np.float32),
            tangent=np.asarray(h.tangent[0], np.float32),
            binormal=np.asarray(h.binormal[0], np.float32),
            view=np.asarray(h.view[0], np.float32),
        )

    # ------------------------------------------------------------- samplers
    def _coin(self, tape, p):
        r = tape.next()[0] * np.float32(0.5) + np.float32(0.5)
        if p and r <= p:
            return True, np.float32(p)
        return False, np.float32(1.0) - np.float32(p)

    def _light_sample(self, tape, li, position):
        u = tape.next()
        s1 = u[0] * np.float32(0.5) + np.float32(0.5)
        s2 = u[1] * np.float32(0.5) + np.float32(0.5)
        s3 = u[2] * np.float32(0.5) + np.float32(0.5)
        r = self.light_radius[li]
        x = r * np.sqrt(s1) * np.cos(np.float32(2.0) * PI * s2)
        y = r * np.sqrt(s1) * np.sin(np.float32(2.0) * PI * s2)
        z = np.sqrt(max(r * r - x * x - y * y, np.float32(0.0))) * np.sin(PI * (s3 - np.float32(0.5)))
        d = _normalize(self.light_center[li] + np.array([x, y, z], np.float32) - position)
        pdf = np.float32(1.0) / _solid_angle(self.light_center[li], r, position)
        return d, pdf

    # ---------------------------------------------------------------- BSDFs
    def _bsdf(self, kind, sp, mat_i):
        n = sp["normal"]
        if kind == "lambert":
            color = self.diffuse[mat_i]

            def sample(tape):
                u4 = tape.next()
                u = u4[0] * np.float32(0.5) + np.float32(0.5)
                v = u4[1] * np.float32(0.5) + np.float32(0.5)
                r = np.sqrt(u)
                phi = v * np.float32(2.0) * PI
                z = np.sqrt(max(np.float32(1.0) - u, np.float32(0.0)))
                local = np.array([r * np.cos(phi), r * np.sin(phi), z], np.float32)
                d = sp["tangent"] * local[0] + sp["binormal"] * local[1] + n * local[2]
                return d, z / PI

            f = lambda d: color / PI
            pdf = lambda d: np.float32(np.dot(d, n)) / PI
        elif kind == "phong":
            color = self.specular[mat_i]
            exp = self.exponent[mat_i]
            refl = _reflect(sp["view"], n)

            def sample(tape):
                u4 = tape.next()
                u = u4[0] * np.float32(0.5) + np.float32(0.5)
                v = u4[1] * np.float32(0.5) + np.float32(0.5)
                a = np.arccos(np.float32(u) ** (np.float32(1.0) / (exp + 1)))
                phi = np.float32(2.0) * PI * v
                local = np.array(
                    [np.sin(a) * np.cos(phi), np.sin(a) * np.sin(phi), np.cos(a)], np.float32
                )
                uax = _normalize(np.cross(np.array([0, 0, 1], np.float32), refl))
                vax = np.cross(uax, refl)
                d = uax * local[0] + vax * local[1] + refl * local[2]
                return d, (exp + 1) / (np.float32(2.0) * PI) * np.cos(a) ** exp

            def f(d):
                cos_a = max(np.float32(np.dot(refl, d)), np.float32(0.0))
                return (exp + 1) / (np.float32(2.0) * PI) * color * cos_a**exp

            def pdf(d):
                cos_a = max(np.float32(np.dot(refl, d)), np.float32(0.0))
                return (exp + 1) / (np.float32(2.0) * PI) * cos_a**exp
        elif kind == "mirror":
            color = self.specular[mat_i]

            def sample(tape):
                return _reflect(sp["view"], n), np.float32(1.0)

            def f(d):
                # reference: color / max(0, cos) — the exponent-0 backface
                # divide-by-zero bug included, so tapes match bit-for-bit
                cos_a = max(np.float32(np.dot(d, n)), np.float32(0.0))
                with np.errstate(divide="ignore", invalid="ignore"):
                    return color / cos_a

            pdf = lambda d: np.float32(0.0)
        else:
            raise ValueError(kind)
        return sample, f, pdf

    # ------------------------------------------------------------ estimator
    def shade(self, sp, tape, depth=0, scheme=ALL):
        if sp["obj"] < 0:
            return self.background.copy()
        mat_i = sp["obj"]
        radiance = self.emission[mat_i].copy() if scheme == ALL else np.zeros(4, np.float32)

        # Russian roulette (w ignored)
        p_rr = float(
            np.max(np.maximum(np.maximum(self.diffuse[mat_i], self.specular[mat_i]), self.transparency[mat_i])[:3])
        )
        cont, prob_rr = self._coin(tape, p_rr)
        if not cont or depth >= DEPTH_LIMIT:
            return radiance / prob_rr

        sum_d = float(np.sum(self.diffuse[mat_i][:3]))
        sum_s = float(np.sum(self.specular[mat_i][:3]))
        sum_t = float(np.sum(self.transparency[mat_i][:3]))
        p_t = sum_t / (sum_d + sum_s + sum_t)
        transmit, prob_t = self._coin(tape, p_t)

        if transmit:
            n = sp["normal"]
            view = sp["view"]
            cos_a = np.float32(np.dot(view, n))
            n_eff = n if cos_a < 0 else -n
            ior = self.ior[mat_i]
            eta = np.float32(1.0) / ior if cos_a < 0 else ior
            ci = np.float32(np.dot(view, n_eff))
            k = np.float32(1.0) - eta * eta * (np.float32(1.0) - ci * ci)
            if k < 0:
                d = _reflect(view, n_eff)
            else:
                d = eta * view - (eta * ci + np.sqrt(k)) * n_eff
            nxt = self.trace1(sp["position"] + d * EPS, d)
            l2 = self.shade(nxt, tape, depth + 1, scheme)
            cos_abs = abs(np.float32(np.dot(n, d)))
            with np.errstate(divide="ignore", invalid="ignore"):
                f = self.specular[mat_i] / cos_abs
            return (np.float32(1.0) / prob_rr) * (np.float32(1.0) / prob_t) * f * cos_abs * (radiance + l2)

        p_d = sum_d / (sum_d + sum_s)
        diff, prob_d = self._coin(tape, p_d)
        if diff:
            kind = "lambert"
        elif self.exponent[mat_i]:
            kind = "phong"
        else:
            kind = "mirror"
        inner = self._shade_with_bsdf(kind, sp, mat_i, tape, depth, scheme)
        return (radiance + inner) / (prob_rr * prob_t * prob_d)

    def _shade_with_bsdf(self, kind, sp, mat_i, tape, depth, scheme):
        sample, f, pdf = self._bsdf(kind, sp, mat_i)
        radiance = np.zeros(4, np.float32)
        n = sp["normal"]
        pos = sp["position"]

        # sampleLights: emissive spheres in scene order, skipping self;
        # the draw happens before any of the continue-checks
        for li in range(len(self.light_obj)):
            lobj = int(self.light_obj[li])
            if lobj == sp["obj"]:
                continue
            d_l, pdf_l = self._light_sample(tape, li, pos)
            if not pdf_l:
                continue
            sh = self.trace1(pos + d_l * EPS, d_l)
            if sh["obj"] != lobj:
                continue
            pdf_b = pdf(d_l)
            if not pdf_b:
                continue
            radiance += (
                np.float32(1.0)
                / (pdf_b + pdf_l)
                * f(d_l)
                * max(np.float32(np.dot(n, d_l)), np.float32(0.0))
                * self.light_emission[li]
            )

        d_b, prob_b = sample(tape)
        if not prob_b:
            return radiance
        nxt = self.trace1(pos + d_b * EPS, d_b)
        # calculateLightProbabilities: visibility-gated pdf sum along d_b
        pdf_sum = np.float32(0.0)
        sh_b = None
        for li in range(len(self.light_obj)):
            lobj = int(self.light_obj[li])
            if lobj == sp["obj"]:
                continue
            if sh_b is None:
                sh_b = self.trace1(pos + d_b * EPS, d_b)  # same ray each light
            if sh_b["obj"] == lobj:
                pdf_sum += np.float32(1.0) / _solid_angle(self.light_center[li], self.light_radius[li], pos)
        l2 = self.shade(nxt, tape, depth + 1, NONEMISSIVE)
        radiance += (
            np.float32(1.0)
            / (pdf_sum + prob_b)
            * f(d_b)
            * max(np.float32(np.dot(n, d_b)), np.float32(0.0))
            * l2
        )
        return radiance

    def replay(self, samples):
        """-> (ours [N,4], theirs [N,4], leftover_uniform_counts [N])."""
        ours, theirs, leftover = [], [], []
        for ray, uniforms, rad in samples:
            tape = _Tape(uniforms)
            sp = self.trace1(ray[:3], ray[3:])
            ours.append(self.shade(sp, tape))
            theirs.append(rad)
            leftover.append(len(uniforms) - tape.i)
        return np.array(ours), np.array(theirs), np.array(leftover)
