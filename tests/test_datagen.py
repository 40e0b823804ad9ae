"""Datagen core tests (pure numpy, no pybullet): CSV index, grids/combos,
surface sampling, color priority, allocation, FPS."""
import numpy as np
import pytest

from pcfm.datagen import (MeshPiece, allocate_points, barycentric_weights,
                          build_per_joint_grids, choose_anno_id,
                          fps_downsample, include_row_by_cats,
                          parse_steps_override, random_combinations,
                          read_index_csv, sample_model_points_colored,
                          sample_piece_points_with_color, sample_surface)


def unit_square(**kw):
    """Two-triangle unit square in the z=0 plane."""
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    f = np.array([[0, 1, 2], [0, 2, 3]])
    return MeshPiece(vertices=v, faces=f, **kw)


def test_reference_index_csv_parses():
    rows = read_index_csv("/root/reference/dataset/partnet_index.csv")
    assert len(rows) > 2000
    scissors = [r for r in rows if include_row_by_cats(r, ["Scissors"])]
    assert len(scissors) == 47
    assert choose_anno_id(scissors[0])


def test_choose_anno_id_priority():
    assert choose_anno_id({"anno_id": "42", "model_id": "m"}) == "42"
    assert choose_anno_id({"model_id": "m7"}) == "m7"
    assert choose_anno_id({"urdf_relpath": "abc/x.urdf"}) == "abc"
    assert choose_anno_id({}) == "unknown"


def test_grids_and_combos():
    joints = [{"name": "joint_0", "lower": 0.0, "upper": 1.0},
              {"name": "joint_1", "lower": -1.0, "upper": 1.0}]
    grids = build_per_joint_grids(joints, 5, parse_steps_override(
        "joint_1:3"))
    assert len(grids[0]) == 5 and len(grids[1]) == 3
    combos = random_combinations(grids, 10, seed=0)
    assert len(combos) == 10
    assert len({tuple(c) for c in combos}) == 10  # unique
    # reproducible
    combos2 = random_combinations(grids, 10, seed=0)
    assert combos == combos2
    # capped by the grid size
    combos3 = random_combinations([np.array([0.0, 1.0])], 10, seed=0)
    assert len(combos3) == 2


def test_barycentric_weights_vertices():
    tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], float)
    w = barycentric_weights(tris, np.array([[0, 0, 0]], float))
    np.testing.assert_allclose(w, [[1, 0, 0]], atol=1e-9)
    w = barycentric_weights(tris, np.array([[0.5, 0.5, 0]], float))
    np.testing.assert_allclose(w, [[0, 0.5, 0.5]], atol=1e-9)


def test_sample_surface_on_plane():
    sq = unit_square()
    assert abs(sq.area - 1.0) < 1e-9
    pts, fidx = sample_surface(sq, 500, np.random.RandomState(0))
    assert pts.shape == (500, 3)
    assert np.all(pts[:, 2] == 0)
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1


def test_color_priority_texture():
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 0] = 200  # red texture
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    sq = unit_square(uv=uv, texture=tex)
    _, rgb = sample_piece_points_with_color(sq, 50,
                                            rng=np.random.RandomState(0))
    assert np.all(rgb[:, 0] == 200) and np.all(rgb[:, 1] == 0)


def test_color_priority_face_and_vertex():
    fc = np.array([[255, 0, 0, 255], [0, 255, 0, 255]], np.uint8)
    sq = unit_square(face_colors=fc)
    pts, rgb = sample_piece_points_with_color(sq, 100,
                                              rng=np.random.RandomState(0))
    assert set(map(tuple, rgb)) <= {(255, 0, 0), (0, 255, 0)}
    vc = np.tile(np.array([[10, 20, 30, 255]], np.uint8), (4, 1))
    sq2 = unit_square(vertex_colors=vc)
    _, rgb2 = sample_piece_points_with_color(sq2, 20,
                                             rng=np.random.RandomState(0))
    assert np.all(np.abs(rgb2.astype(int) - [10, 20, 30]) <= 1)


def test_color_priority_material_and_gray():
    sq = unit_square(material_rgba=np.array([1, 2, 3, 255], np.uint8))
    _, rgb = sample_piece_points_with_color(sq, 10,
                                            rng=np.random.RandomState(0))
    assert np.all(rgb == [1, 2, 3])
    sq2 = unit_square()
    _, rgb2 = sample_piece_points_with_color(sq2, 10,
                                             rng=np.random.RandomState(0))
    assert np.all(rgb2 == [180, 180, 180])


def test_color_multi_material_mixed():
    """One textured material + one Kd-only material, routed per face
    (make_dataset.py:318-360 mixed-material path)."""
    from pcfm.datagen.core import Material
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 1] = 150  # green texture
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    mats = [Material(image=tex), Material(rgba=np.array([9, 8, 7, 255],
                                                        np.uint8))]
    sq = unit_square(uv=uv, materials=mats,
                     face_materials=np.array([0, 1]))
    pts, rgb = sample_piece_points_with_color(sq, 200,
                                              rng=np.random.RandomState(0))
    got = set(map(tuple, rgb))
    assert (0, 150, 0) in got and (9, 8, 7) in got
    assert got <= {(0, 150, 0), (9, 8, 7)}


def test_face_rgba_from_materials_no_uv():
    """Multi-material mesh WITHOUT texture/UV -> per-face Kd (path C,
    make_dataset.py:223-254)."""
    from pcfm.datagen.core import Material, face_rgba_from_materials
    mats = [Material(rgba=np.array([255, 0, 0, 255], np.uint8)),
            Material(rgba=np.array([0, 0, 255, 255], np.uint8))]
    sq = unit_square(materials=mats, face_materials=np.array([0, 1]))
    fc = face_rgba_from_materials(sq)
    np.testing.assert_array_equal(fc[0], [255, 0, 0, 255])
    np.testing.assert_array_equal(fc[1], [0, 0, 255, 255])
    _, rgb = sample_piece_points_with_color(sq, 100,
                                            rng=np.random.RandomState(0))
    assert set(map(tuple, rgb)) <= {(255, 0, 0), (0, 0, 255)}


def test_bake_piece_colors():
    from pcfm.datagen.core import Material, bake_piece_colors
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 0] = 99
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    mats = [Material(image=tex), Material(rgba=np.array([1, 2, 3, 255],
                                                        np.uint8))]
    sq = unit_square(uv=uv, materials=mats,
                     face_materials=np.array([0, 1]))
    fc = bake_piece_colors(sq)
    np.testing.assert_array_equal(fc[0], [99, 0, 0, 255])
    np.testing.assert_array_equal(fc[1], [1, 2, 3, 255])
    # colorless mesh -> gray
    fc2 = bake_piece_colors(unit_square())
    np.testing.assert_array_equal(fc2[0], [180, 180, 180, 255])


def test_material_color_to_rgba255():
    from pcfm.datagen.core import material_color_to_rgba255
    np.testing.assert_array_equal(
        material_color_to_rgba255([1.0, 0.5, 0.0]),
        [255, 127, 0, 255])
    np.testing.assert_array_equal(
        material_color_to_rgba255(np.array([10, 20, 30, 40])),
        [10, 20, 30, 40])
    assert material_color_to_rgba255(None) is None
    assert material_color_to_rgba255([0.5]) is None


def test_allocate_points_area_weighted():
    alloc = allocate_points(np.array([1.0, 3.0]), 100)
    assert alloc.sum() == 100
    assert alloc[1] == 75


def test_sample_model_points_colored_total():
    a = unit_square(material_rgba=np.array([255, 0, 0, 255], np.uint8))
    b = unit_square(material_rgba=np.array([0, 0, 255, 255], np.uint8))
    b = MeshPiece(vertices=b.vertices * 2.0, faces=b.faces,
                  material_rgba=b.material_rgba)  # 4x area
    pts, rgb = sample_model_points_colored([a, b], 200,
                                           rng=np.random.RandomState(0))
    assert pts.shape == (200, 3)
    n_blue = int(np.sum(rgb[:, 2] == 255))
    assert 140 <= n_blue <= 180  # ~4/5 of points on the bigger piece


def test_fps_downsample_spreads():
    rng = np.random.RandomState(0)
    pts = np.concatenate([np.zeros((50, 3)),
                          np.ones((50, 3)) * 10], axis=0)
    idx = fps_downsample(pts + rng.rand(100, 3) * 0.01, 2, rng)
    # the two FPS picks must land in different clusters
    assert (idx[0] < 50) != (idx[1] < 50)


def test_fps_sampling_method():
    sq = unit_square()
    pts, rgb = sample_piece_points_with_color(sq, 32, method="fps",
                                              oversample=4,
                                              rng=np.random.RandomState(0))
    assert pts.shape == (32, 3)


def test_simulate_backend_fallback():
    """Without pybullet installed the simulate shell gets the built-in
    kinematic backend (r3; the r2 behavior was a RuntimeError guard)."""
    from pcfm.datagen.bullet_kin import KinematicsClient
    from pcfm.datagen.simulate import _require_pybullet
    p = _require_pybullet()
    try:
        import pybullet
        assert p is pybullet
    except ImportError:
        assert isinstance(p, KinematicsClient)
