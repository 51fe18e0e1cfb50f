"""Lane-compaction kernel: Pallas (interpret) vs the argsort oracle, the
closed-form dest map round-trip, and full-trace bit-exactness with
compaction+buckets enabled."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas import compact_kernel as ck


def _rand_wavefront(rng, rows, alive_frac):
    state = rng.standard_normal((10, rows, ck.LANES)).astype(np.float32)
    alive = rng.random((rows, ck.LANES)) < alive_frac
    state[9] = alive.astype(np.float32)
    off = rng.integers(0, 2 ** 32, size=(rows, ck.LANES), dtype=np.uint32)
    return jnp.asarray(state), jnp.asarray(off)


def test_compact_matches_oracle():
    rng = np.random.default_rng(0)
    for frac in (0.0, 0.03, 0.3, 0.7, 1.0):
        state, off = _rand_wavefront(rng, 16, frac)
        got = ck.compact_blocks(state, off, interpret=True)
        want = ck.compact_blocks_ref(state, off)
        for g, w, name in zip(got, want, ["state", "off", "k"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=f"{name} frac={frac}")


def test_compact_structured_masks():
    """Adversarial alive patterns: runs, alternating lanes, single lanes at
    block edges — the shift network's hard cases."""
    rows = 8
    n = rows * ck.LANES
    patterns = [
        np.arange(n) % 2 == 0,
        np.arange(n) % 2 == 1,
        np.arange(n) < 1,
        np.arange(n) >= n - 1,
        (np.arange(n) // 100) % 2 == 0,
        np.zeros(n, bool),
        np.ones(n, bool),
    ]
    rng = np.random.default_rng(1)
    for pat in patterns:
        state, off = _rand_wavefront(rng, rows, 1.0)
        state = state.at[9].set(jnp.asarray(
            pat.reshape(rows, ck.LANES).astype(np.float32)))
        got = ck.compact_blocks(state, off, interpret=True)
        want = ck.compact_blocks_ref(state, off)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_trace_with_compaction_bit_exact():
    """Full fused trace (interpret mode) with lane compaction + prefix
    buckets enabled is BIT-identical to the same trace without them:
    compaction only relocates lanes, every per-lane arithmetic sequence is
    unchanged, and the flush chain returns each lane's radiance to its
    original slot exactly once."""
    from pathtracer_tpu.integrator import _trace_pallas2
    from pathtracer_tpu.models import shirley
    from pathtracer_tpu.ops.lds import Sampler

    W = H = 64
    B = 6
    scene, cam, background = shirley.build(W / H)
    sampler = Sampler(2 + 2 * B)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    offset = jnp.asarray((ys * W + xs).reshape(-1).astype(np.uint32))
    dx = sampler.get(offset, 0)
    dy = sampler.get(offset, 1)
    cx = (jnp.asarray(xs.reshape(-1), jnp.float32) + dx) / W
    cy = 1.0 - (jnp.asarray(ys.reshape(-1), jnp.float32) + dy) / H
    d = cam.ray_dirs(cx, cy, jnp.float32).reshape(-1, 3)
    org = jnp.zeros_like(d)

    def run(compact_at):
        return _trace_pallas2(scene, sampler, org, d, offset, B, background,
                              None, compact_at=compact_at, interpret=True)

    rad0, segs0 = run(())
    rad1, segs1 = run((1, 3))
    assert int(segs0) == int(segs1)
    np.testing.assert_array_equal(np.asarray(rad0), np.asarray(rad1))


def test_pack_rows_and_dest_map_roundtrip():
    """dest_map must point every live original lane at its exact payload in
    the packed ordering (the restore path relies on this)."""
    rng = np.random.default_rng(2)
    for frac in (0.05, 0.3, 0.9):
        state, off = _rand_wavefront(rng, 24, frac)
        alive_pre = state[9] > 0.0
        st_c, off_c, k = ck.compact_blocks_ref(state, off)
        st_p, off_p, n_rows = ck.pack_rows(st_c, off_c, k)
        dest = ck.dest_map(alive_pre, k)

        a = np.asarray(alive_pre).reshape(-1)
        d = np.asarray(dest)
        off_flat = np.asarray(off).reshape(-1)
        off_p_flat = np.asarray(off_p).reshape(-1)
        st_p_flat = np.asarray(st_p).reshape(10, -1)
        # every live lane's payload is found at dest[i]
        np.testing.assert_array_equal(off_p_flat[d[a]], off_flat[a])
        # packed alive flags: exactly the live lanes, at the dest positions
        alive_p = st_p_flat[9] > 0
        assert alive_p.sum() == a.sum()
        assert alive_p[d[a]].all()
        # all live lanes sit within the first n_rows rows
        assert int(n_rows) * ck.LANES >= int(a.sum())
        assert not alive_p[int(n_rows) * ck.LANES:].any()
