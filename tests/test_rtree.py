"""STRtree packed R-tree: structural invariants + equivalence with the
grid PolygonIndex on dense probe clouds (the two candidate-pruning
structures must yield identical exact-PiP join pairs)."""

import numpy as np
import pytest

from plasmap_ray import cells, fixtures
from plasmap_ray.stages import geo
from plasmap_ray.stages.rtree import STRtreeIndex, _pack_level


def _pairs(idx, lon, lat):
    p, q = idx.query(lon, lat)
    return set(zip(p.tolist(), q.tolist()))


def test_str_pack_level_shapes():
    rng = np.random.default_rng(7)
    boxes = np.sort(rng.uniform(0, 10, size=(100, 4)).reshape(100, 2, 2), axis=1).reshape(100, 4)[:, [0, 2, 1, 3]]
    nodes = _pack_level(boxes, 16)
    # every entry appears exactly once, node sizes bounded by capacity
    got = np.sort(np.concatenate(nodes))
    assert got.tolist() == list(range(100))
    assert all(1 <= m.size <= 16 for m in nodes)


def test_strtree_invariants():
    polys = fixtures.admin_polygons()
    t = STRtreeIndex(polys, node_capacity=4)
    assert t.height >= 2  # fixture world has > 4 boundaries
    assert len(t.levels[-1][1]) == 1  # single root
    # node MBR contains all member boxes, at every level
    for level, (boxes, members) in enumerate(t.levels):
        for node, m in enumerate(members):
            assert 1 <= m.size <= 4
            if level == 0:
                child = np.array([t.polygons[int(i)]["bbox"] for i in m], dtype=np.float64)
            else:
                child = t.levels[level - 1][0][m]
            b = boxes[node]
            assert (child[:, 0] >= b[0]).all() and (child[:, 1] >= b[1]).all()
            assert (child[:, 2] <= b[2]).all() and (child[:, 3] <= b[3]).all()
    # every polygon reachable exactly once from the leaves
    leaf_members = np.sort(np.concatenate([m for m in t.levels[0][1]]))
    assert leaf_members.tolist() == list(range(len(polys)))


@pytest.mark.parametrize("capacity", [2, 8, 64])
def test_strtree_matches_grid_index(capacity):
    polys = fixtures.admin_polygons()
    grid = geo.PolygonIndex(polys, precision=cells.PRECISION_VERY_LOW)
    tree = STRtreeIndex(polys, node_capacity=capacity)
    rng = np.random.default_rng(42)
    # dense cloud over the fixture world's bbox, plus exact envelope
    # corners (half-open boundary semantics must agree)
    lon = rng.uniform(5.0, 9.0, 4000)
    lat = rng.uniform(49.0, 53.0, 4000)
    corners = np.array([p["bbox"] for p in tree.polygons], dtype=np.float64)
    lon = np.concatenate([lon, corners[:, 0], corners[:, 2]])
    lat = np.concatenate([lat, corners[:, 1], corners[:, 3]])
    assert _pairs(tree, lon, lat) == _pairs(grid, lon, lat)


def test_strtree_empty_and_single():
    assert STRtreeIndex([]).query(np.array([1.0]), np.array([2.0]))[0].size == 0
    one = [dict(rel_id=1, name="sq", admin_level=4, outer=np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float))]
    t = STRtreeIndex(one)
    assert t.height == 1
    p, q = t.query(np.array([1.0, 5.0]), np.array([1.0, 5.0]))
    assert p.tolist() == [0] and q.tolist() == [0]
