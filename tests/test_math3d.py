"""math3d vs goldens generated from the vendored glm 0.9.3 (tools/glm_golden.cpp)."""

import numpy as np

from kajo_tpu.utils import math3d

# Goldens printed by the reference's own glm (degrees convention), row-major.
LOOKAT = np.array(
    [-0.554700196, -0, -0.832050323, -0,
     0.0917448327, -0.993902326, -0.0611632206, 1.49011612e-08,
     -0.826976717, -0.110263564, 0.551317811, -7.25534248,
     0, 0, 0, 1], np.float32).reshape(4, 4)
PERSP = np.array(
    [1.81066, 0, 0, 0,
     0, 2.41421342, 0, 0,
     0, 0, -1.002002, -0.2002002,
     0, 0, -1, 0], np.float32).reshape(4, 4)
RT = np.array(
    [0.99999994, 0, 0, 0,
     0, -4.37113883e-08, 1, -8.74227766e-08,
     0, -1, -4.37113883e-08, -2,
     0, 0, 0, 1], np.float32).reshape(4, 4)
TRS = np.array(
    [1.86602545, 0.200961918, 1.41421354, 1,
     0.133974612, 2.79903817, -1.41421354, 2,
     -0.707106769, 1.06066012, 3.46410155, 3,
     0, 0, 0, 1], np.float32).reshape(4, 4)


def test_look_at():
    m = math3d.look_at([-6, -0.8, 4], [0, 0, 0], [0, -1, 0])
    np.testing.assert_allclose(m, LOOKAT, atol=1e-6)


def test_perspective_degrees():
    m = math3d.perspective(45.0, 4.0 / 3.0, 0.1, 100.0)
    np.testing.assert_allclose(m, PERSP, atol=1e-6)


def test_rotate_translate_composition():
    m = math3d.translate(math3d.rotate(math3d.identity(), -90, [1, 0, 0]), [0, 2, 0])
    np.testing.assert_allclose(m, RT, atol=1e-6)


def test_translate_rotate_scale():
    m = math3d.scale(
        math3d.rotate(math3d.translate(math3d.identity(), [1, 2, 3]), 30, [1, 1, 0]),
        [2, 3, 4],
    )
    np.testing.assert_allclose(m, TRS, atol=1e-5)


def test_unproject_camera_basis():
    # Camera-basis construction exactly as cpu/Renderer.cpp:30-34.
    view = math3d.look_at([-6, -0.8, 4], [0, 0, 0], [0, -1, 0])
    proj = math3d.perspective(45.0, 4.0 / 3.0, 0.1, 100.0)
    p1 = math3d.unproject([0, 0, 0], view, proj)
    p2 = math3d.unproject([1, 0, 0], view, proj)
    p3 = math3d.unproject([0, 1, 0], view, proj)
    origin = np.linalg.inv(view) @ np.array([0, 0, 0, 1], np.float32)
    np.testing.assert_allclose(p1, [-5.89046764, -0.747805119, 3.9933548], atol=1e-5)
    np.testing.assert_allclose(p2, [-5.95173788, -0.747805119, 3.9014492], atol=1e-5)
    np.testing.assert_allclose(p3, [-5.88286734, -0.830142438, 3.98828769], atol=1e-5)
    np.testing.assert_allclose(origin[:3], [-6.00000048, -0.800000072, 4], atol=1e-5)
