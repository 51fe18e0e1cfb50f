import os

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.io import ply
from pathtracer_tpu.ops import triangles as tri_ops
from pathtracer_tpu.ops.bvh import MeshBVH, build_bvh


def _mesh(n=60, seed=3):
    rs = np.random.RandomState(seed)
    verts = rs.uniform(-5, 5, (n, 3))
    faces = rs.randint(0, n, (2 * n, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    return verts, faces


def test_ply_roundtrip(tmp_path):
    verts, faces = _mesh()
    path = os.path.join(tmp_path, "m.ply")
    ply.write_mesh(path, verts, faces)
    p = ply.load(path)
    np.testing.assert_allclose(
        np.stack([p.data["vertex"][k] for k in "xyz"], 1),
        verts.astype(np.float32))
    np.testing.assert_array_equal(
        p.data["vertex_indices"]["vertex_indices"], faces)


def test_ply_rejects_bad_magic(tmp_path):
    path = os.path.join(tmp_path, "bad.ply")
    with open(path, "wb") as f:
        f.write(b"not a ply file")
    try:
        ply.load(path)
        assert False, "expected PlyError"
    except ply.PlyError:
        pass


def test_ply_rejects_ascii(tmp_path):
    path = os.path.join(tmp_path, "ascii.ply")
    with open(path, "wb") as f:
        f.write(b"ply\nformat ascii 1.0\nelement vertex 0\n"
                b"property float x\nend_header\n")
    try:
        ply.load(path)
        assert False, "expected PlyError (ascii unsupported, like the ref)"
    except ply.PlyError:
        pass


def test_bvh_structure():
    verts, faces = _mesh(200, seed=1)
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    lo = np.minimum(np.minimum(a, b), c)
    hi = np.maximum(np.maximum(a, b), c)
    nodes_lo, nodes_hi, meta, order, depth = build_bvh(lo, hi)
    # every primitive appears exactly once across leaves
    assert sorted(order.tolist()) == list(range(len(faces)))
    # root bbox covers everything
    np.testing.assert_allclose(nodes_lo[0], lo.min(0), rtol=1e-6)
    np.testing.assert_allclose(nodes_hi[0], hi.max(0), rtol=1e-6)
    assert depth >= 2
    # leaves within cutoff
    leaf_sizes = meta[meta[:, 1] > 0, 1]
    assert leaf_sizes.max() <= 8


def test_bvh_traversal_matches_bruteforce():
    verts, faces = _mesh(80, seed=7)
    mat = np.zeros(12, np.float32)
    mesh = MeshBVH(verts, faces, mat)
    rs = np.random.RandomState(0)
    n = 256
    org = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_b, u_b, v_b, idx_b, hit_b = mesh.intersect(jnp.asarray(org),
                                                 jnp.asarray(d))

    # brute force over the same (reordered) triangle set
    tc = tri_ops.pack_for_intersect(mesh.tri_a, mesh.tri_e1, mesh.tri_e2,
                                    jnp.ones(mesh.n_tris, bool))
    t_f, idx_f, hit_f = tri_ops.intersect_tris(tc, jnp.asarray(org),
                                               jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_f))
    h = np.asarray(hit_b)
    np.testing.assert_allclose(np.asarray(t_b)[h], np.asarray(t_f)[h],
                               rtol=1e-5, atol=1e-6)
    # same winning triangle except exact ties
    same = np.asarray(idx_b)[h] == np.asarray(idx_f)[h]
    assert same.mean() > 0.95


def test_bvh_traversal_chunked_odd_sizes():
    """Chunking must pad (not silently disable) when n % chunk != 0; results
    are identical to the unchunked walk for every odd size."""
    verts, faces = _mesh(60, seed=3)
    mat = np.zeros(12, np.float32)
    mesh = MeshBVH(verts, faces, mat)
    rs = np.random.RandomState(1)
    for n in (130, 257, 1000):
        org = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
        d = rs.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        want = mesh.intersect(jnp.asarray(org), jnp.asarray(d), chunk=None)
        got = mesh.intersect(jnp.asarray(org), jnp.asarray(d), chunk=128)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_octant_walk_matches_skiplink():
    """The octant-ordered unified-table walk must agree with the round-1
    skip-link walk (the --no-simd-style A/B oracle for the mesh path)."""
    verts, faces = _mesh(120, seed=11)
    mat = np.zeros(12, np.float32)
    m_oct = MeshBVH(verts, faces, mat, walk="octant")
    m_skip = MeshBVH(verts, faces, mat, walk="skiplink")
    rs = np.random.RandomState(2)
    n = 700
    org = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    t_max = np.where(rs.rand(n) < 0.5, 3.0, 1e30).astype(np.float32)
    active = rs.rand(n) > 0.25
    o1 = m_oct.intersect(jnp.asarray(org), jnp.asarray(d),
                         jnp.asarray(t_max), jnp.asarray(active), chunk=256)
    o2 = m_skip.intersect(jnp.asarray(org), jnp.asarray(d),
                          jnp.asarray(t_max), jnp.asarray(active), chunk=256)
    h1, h2 = np.asarray(o1[4]), np.asarray(o2[4])
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(np.asarray(o1[0])[h1], np.asarray(o2[0])[h1],
                               rtol=1e-5, atol=1e-6)


def test_wide_walks_match_skiplink():
    """The BVH4 and BVH8 re-entry walks (wide rows, phase-encoded
    pointers, quantized boxes for BVH8) must agree with the skip-link
    oracle on hit set, t, and winner index — including with t_max caps
    and inactive lanes."""
    verts, faces = _mesh(120, seed=11)
    mat = np.zeros(12, np.float32)
    m_skip = MeshBVH(verts, faces, mat, walk="skiplink")
    rs = np.random.RandomState(2)
    n = 700
    org = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    t_max = np.where(rs.rand(n) < 0.5, 3.0, 1e30).astype(np.float32)
    active = rs.rand(n) > 0.25
    o2 = m_skip.intersect(jnp.asarray(org), jnp.asarray(d),
                          jnp.asarray(t_max), jnp.asarray(active),
                          chunk=256)
    for walk in ("bvh4", "bvh8"):
        m_w = MeshBVH(verts, faces, mat, walk=walk)
        o1 = m_w.intersect(jnp.asarray(org), jnp.asarray(d),
                           jnp.asarray(t_max), jnp.asarray(active),
                           chunk=256)
        h1, h2 = np.asarray(o1[4]), np.asarray(o2[4])
        np.testing.assert_array_equal(h1, h2, err_msg=walk)
        np.testing.assert_allclose(np.asarray(o1[0])[h1],
                                   np.asarray(o2[0])[h1],
                                   rtol=1e-5, atol=1e-6, err_msg=walk)
        np.testing.assert_array_equal(np.asarray(o1[3])[h1],
                                      np.asarray(o2[3])[h1], err_msg=walk)


def test_wide_table_builders_python_matches_native():
    """C++ and python BVH4/BVH8 walk-table builders are byte-identical."""
    from pathtracer_tpu.ops.bvh import (build_bvh, build_walk_table4,
                                        build_walk_table8)

    verts, faces = _mesh(150, seed=5)
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    lo = np.minimum(np.minimum(a, b), c)
    hi = np.maximum(np.maximum(a, b), c)
    nodes_lo, nodes_hi, meta, order, depth, axes = build_bvh(
        lo, hi, want_axes=True)
    aa, bb, cc = a[order], b[order], c[order]
    for build in (build_walk_table4, build_walk_table8):
        t_n = build(nodes_lo, nodes_hi, meta, axes, aa, bb - aa, cc - aa,
                    native=True)
        t_p = build(nodes_lo, nodes_hi, meta, axes, aa, bb - aa, cc - aa,
                    native=False)
        assert t_n[1:] == t_p[1:]
        np.testing.assert_array_equal(t_n[0].view(np.uint32),
                                      t_p[0].view(np.uint32))


def test_bvh8_multipass_bit_exact():
    """The BVH8 capped multi-pass walk is bit-exact vs one uncapped
    pass (same invariant the octant walk guarantees)."""
    verts, faces = _mesh(150, seed=5)
    mat = np.zeros(12, np.float32)
    m = MeshBVH(verts, faces, mat, walk="bvh8")
    rs = np.random.RandomState(7)
    n = 1111
    org = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    t_max = np.where(rs.rand(n) < 0.5, 3.0, 1e30).astype(np.float32)
    active = rs.rand(n) > 0.25
    a = m.intersect(jnp.asarray(org), jnp.asarray(d), jnp.asarray(t_max),
                    jnp.asarray(active), chunk=128, caps=(6, 12, 0))
    b = m.intersect(jnp.asarray(org), jnp.asarray(d), jnp.asarray(t_max),
                    jnp.asarray(active), chunk=128, caps=(0,))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flatten_octants_python_matches_native():
    from pathtracer_tpu.native import bvh_flatten_octants_native
    from pathtracer_tpu.ops.bvh import flatten_octants

    verts, faces = _mesh(150, seed=5)
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    lo = np.minimum(np.minimum(a, b), c)
    hi = np.maximum(np.maximum(a, b), c)
    nodes_lo, nodes_hi, meta, order, depth, axes = build_bvh(
        lo, hi, want_axes=True)
    native = bvh_flatten_octants_native(meta, axes)
    perm, enter, skip = flatten_octants(meta, axes, native=False)
    m = meta.shape[0]
    if native is not None:
        np.testing.assert_array_equal(native[0], perm)
        np.testing.assert_array_equal(native[1], enter)
        np.testing.assert_array_equal(native[2], skip)
    # octant 0 == canonical DFS order
    np.testing.assert_array_equal(perm[0], np.arange(m))
    # every octant's perm is a permutation
    for o in range(8):
        assert sorted(perm[o].tolist()) == list(range(m))


def test_ganesha_pipeline_tiny(tmp_path):
    from tools.make_test_mesh import uv_sphere
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu.ppm import PPMRenderer

    verts, faces = uv_sphere(12, 8, np.array([328.0, 60.0, 150.0]), 45.0)
    path = os.path.join(tmp_path, "tiny_ganesha.ply")
    ply.write_mesh(path, verts, faces)
    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    assert mesh.n_tris == len(faces)
    rend = PPMRenderer(scene, cam, lights, 24, 24, iterations=1,
                       photon_count=1000, max_bounces=3, verbose=False,
                       mesh=mesh, bbox_override=bbox)
    img = rend.render()
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_multipass_walk_bit_exact_vs_single_pass():
    """The capped multi-pass walk (mid-walk resort by (finished, ptr))
    must be BIT-exact vs one uncapped pass: per-lane walk state is
    independent of chunk grouping and pass boundaries."""
    verts, faces = _mesh(150, seed=5)
    mat = np.zeros(12, np.float32)
    m = MeshBVH(verts, faces, mat, walk="octant")
    rs = np.random.RandomState(7)
    n = 1111  # odd: exercises padding too
    org = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    t_max = np.where(rs.rand(n) < 0.5, 3.0, 1e30).astype(np.float32)
    active = rs.rand(n) > 0.25
    a = m.intersect(jnp.asarray(org), jnp.asarray(d), jnp.asarray(t_max),
                    jnp.asarray(active), chunk=128, caps=(8, 16, 0))
    b = m.intersect(jnp.asarray(org), jnp.asarray(d), jnp.asarray(t_max),
                    jnp.asarray(active), chunk=128, caps=(0,))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _check_bvh_valid(lo, hi, nodes_lo, nodes_hi, meta, order, depth):
    """Structural invariants every SAH build must satisfy (C++ or python;
    they may legitimately differ bitwise on bin ties — std::partition vs
    stable masking — so parity is checked at this level plus the live A/B
    walk oracles, not byte-by-byte)."""
    n = len(lo)
    m = len(meta)
    # `order` is a permutation of the primitives
    assert sorted(order.tolist()) == list(range(n))
    first, count, skip = meta[:, 0], meta[:, 1], meta[:, 2]
    leaves = count > 0
    # leaves tile `order` contiguously in DFS emission order
    leaf_first = first[leaves]
    leaf_count = count[leaves]
    assert leaf_first[0] == 0
    np.testing.assert_array_equal(
        leaf_first[1:], (leaf_first + leaf_count)[:-1])
    assert leaf_first[-1] + leaf_count[-1] == n
    # every node's box contains the union of its primitives' boxes
    starts = np.zeros(m, np.int64)
    ends = np.zeros(m, np.int64)
    # subtree prim range: DFS order means node i covers order rows
    # [subtree_first, subtree_end) where leaves inside [i, skip) tile it
    for i in range(m):
        if leaves[i]:
            starts[i], ends[i] = first[i], first[i] + count[i]
        else:
            sub = leaves[i:skip[i]]
            lf = first[i:skip[i]][sub]
            lc = count[i:skip[i]][sub]
            starts[i], ends[i] = lf.min(), (lf + lc).max()
    for i in range(m):
        prims = order[starts[i]:ends[i]]
        np.testing.assert_allclose(nodes_lo[i], lo[prims].min(0), rtol=0,
                                   atol=0)
        np.testing.assert_allclose(nodes_hi[i], hi[prims].max(0), rtol=0,
                                   atol=0)
    # skip links: leaf skip = i+1; inner skip = just past the subtree
    np.testing.assert_array_equal(skip[leaves],
                                  np.nonzero(leaves)[0] + 1)
    assert depth >= 1 and depth <= max(2 * int(np.ceil(np.log2(max(n, 2))))
                                       + 32, 8)


def test_sah_build_native_valid_and_deterministic():
    """The C++ SAH builder (incl. the threaded ParBuilder path) must be
    run-to-run deterministic and structurally valid; exact-output parity
    with the python builder is NOT required (documented bin-tie
    divergence) — the A/B walk oracles pin behavioral equivalence."""
    from pathtracer_tpu.native import bvh_build_native

    rs = np.random.RandomState(11)
    for n, cutoff in ((500, 4), (5000, 8)):
        c = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
        e = rs.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
        lo, hi = c - e, c + e
        # a degenerate clump exercises the median-split fallback
        lo[: n // 50] = lo[0]
        hi[: n // 50] = hi[0]
        nat = bvh_build_native(lo, hi, cutoff, 32, 1.0, 0.25)
        assert nat is not None, "native builder unavailable"
        nodes_lo, nodes_hi, meta, order, depth = nat
        _check_bvh_valid(lo, hi, nodes_lo, nodes_hi, meta, order, depth)
        again = bvh_build_native(lo, hi, cutoff, 32, 1.0, 0.25)
        for a, b in zip(nat, again):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the python builder satisfies the same invariants
        py = build_bvh(lo, hi, length_cutoff=cutoff, native=False)
        _check_bvh_valid(lo, hi, np.asarray(py[0]), np.asarray(py[1]),
                         np.asarray(py[2]), np.asarray(py[3]), py[4])


def test_sah_build_native_parallel_path_deterministic():
    """Above the 65536-prim threshold the builder takes the threaded
    ParBuilder path; it must still be deterministic and valid."""
    from pathtracer_tpu.native import bvh_build_native

    rs = np.random.RandomState(7)
    n = 70000
    c = rs.uniform(-50, 50, (n, 3)).astype(np.float32)
    e = rs.uniform(0.01, 0.3, (n, 3)).astype(np.float32)
    lo, hi = c - e, c + e
    nat = bvh_build_native(lo, hi, 8, 32, 1.0, 0.25)
    assert nat is not None, "native builder unavailable"
    nodes_lo, nodes_hi, meta, order, depth = nat
    n_leaf_prims = meta[meta[:, 1] > 0, 1].sum()
    assert n_leaf_prims == n
    assert sorted(order.tolist()) == list(range(n))
    again = bvh_build_native(lo, hi, 8, 32, 1.0, 0.25)
    for a, b in zip(nat, again):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
