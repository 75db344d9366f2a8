"""TPU check: Pallas FPS kernels — validity vs numpy replay + timing.

Interpret-mode bit-parity vs the jnp path is pinned in
tests/test_sampling.py; on-device, cross-lowering FMA/reduction
differences can break bitwise ties differently (observed: an exact
key tie at pick 651), so here each backend's pick sequence is
validated FUNCTIONALLY: every pick must maximize the step key in a
float32 numpy replay within 1e-5 relative tolerance.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from de6d_tpu.ops import sampling
from de6d_tpu.ops.pallas.fps import fps_pallas, matrix_fps_pallas

rng = np.random.default_rng(0)
print("backend:", jax.default_backend())


def replay_ok(xyz, picks, w=None, dm=None, tol=1e-5):
    n = xyz.shape[0] if dm is None else dm.shape[0]
    md = np.full(n, 1e10, np.float32)
    weff = None if w is None else np.maximum(w, 1e-12)
    if w is not None:
        if picks[0] != np.argmax(w):  # seed = first argmax of raw w
            return False, 0
    elif picks[0] != 0:
        return False, 0
    last = picks[0]
    for j in range(1, len(picks)):
        d = (dm[last] if dm is not None
             else ((xyz - xyz[last]) ** 2).sum(1)).astype(np.float32)
        md = np.minimum(md, d)
        key = md * weff if w is not None else md
        mx = key.max()
        if key[picks[j]] < mx - tol * max(abs(mx), 1e-6):
            return False, j
        last = picks[j]
    return True, -1


for b, n, npoint, weighted in [(8, 16384, 4096, False),
                               (8, 4096, 1024, True),
                               (8, 1024, 512, True),
                               (1, 16384, 4096, False)]:
    xyz_h = rng.standard_normal((b, n, 3)).astype(np.float32) * 20
    w_h = rng.random((b, n)).astype(np.float32)
    xyz = jnp.asarray(xyz_h)
    valid = jnp.ones((b, n), bool)
    if weighted:
        got = np.asarray(fps_pallas(xyz, valid, npoint,
                                    weights=jnp.asarray(w_h), weighted=True))
    else:
        got = np.asarray(fps_pallas(xyz, valid, npoint))
    for bi in range(b):
        ok, j = replay_ok(xyz_h[bi], got[bi], w=w_h[bi] if weighted else None)
        assert ok, (b, n, npoint, weighted, bi, j)
    print(f"fps b={b} n={n} m={npoint} weighted={weighted}: functionally valid")

b, n, npoint = 8, 4096, 1024
xyz_h = rng.standard_normal((b, n, 3)).astype(np.float32) * 5
feats = jnp.asarray(rng.standard_normal((b, n, 16)).astype(np.float32))
dm = sampling.calc_dist_matrix_for_sampling(jnp.asarray(xyz_h), feats)
valid = jnp.ones((b, n), bool)
got = np.asarray(matrix_fps_pallas(dm, valid, npoint))
dm_h = np.asarray(dm)
for bi in range(b):
    ok, j = replay_ok(None, got[bi], dm=dm_h[bi])
    assert ok, ("matrix", bi, j)
print(f"matrix fps b={b} n={n} m={npoint}: functionally valid")


def timeit(fn, x0, reps=5):
    out = fn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    x = x0
    for _ in range(reps):
        out = fn(x)
        x = x + (out[0, 0].astype(jnp.float32) % 2) * 1e-6
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3

b, n, m = 8, 16384, 4096
xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 20)
valid = jnp.ones((b, n), bool)
print(f"pallas d-fps {n}->{m} x{b}: "
      f"{timeit(lambda p: fps_pallas(p, valid, m), xyz):.2f} ms/call")
print(f"jnp    d-fps {n}->{m} x{b}: "
      f"{timeit(lambda p: sampling._farthest_point_sample_jnp(p, m, valid), xyz, reps=2):.2f} ms/call")

b2, n2, m2 = 8, 4096, 1024
xyz2 = jnp.asarray(rng.standard_normal((b2, n2, 3)).astype(np.float32) * 20)
w2 = jnp.asarray(rng.random((b2, n2)).astype(np.float32))
valid2 = jnp.ones((b2, n2), bool)
print(f"pallas s-fps {n2}->{m2} x{b2}: "
      f"{timeit(lambda p: fps_pallas(p, valid2, m2, weights=w2, weighted=True), xyz2):.2f} ms/call")
print(f"jnp    s-fps {n2}->{m2} x{b2}: "
      f"{timeit(lambda p: sampling._weighted_farthest_point_sample_jnp(p, w2, m2, valid2), xyz2, reps=2):.2f} ms/call")

dm2 = sampling.calc_dist_matrix_for_sampling(xyz2, feats)
print(f"pallas f-fps rows {n2}->{m2} x{b2}: "
      f"{timeit(lambda p: matrix_fps_pallas(p, valid2, m2), dm2):.2f} ms/call")
print(f"jnp    f-fps rows {n2}->{m2} x{b2}: "
      f"{timeit(lambda p: sampling._matrix_farthest_point_sample_jnp(p, m2, valid2), dm2, reps=2):.2f} ms/call")
