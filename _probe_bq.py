import time, numpy as np, jax, jax.numpy as jnp
from de6d_tpu.ops import ball_query as bq
B, N, M = 8, 16384, 4096
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.uniform(-40, 40, (B, N, 3)).astype(np.float32))
ctr = jnp.asarray(rng.uniform(-40, 40, (B, M, 3)).astype(np.float32))

def timeloop(f, x0, label, iters=5, loops=3):
    x = f(x0); jax.block_until_ready(x)
    best = None
    for k in range(loops):
        t0 = time.perf_counter(); s = x0
        for _ in range(iters):
            s = f(s)
        jax.block_until_ready(s)
        dt = (time.perf_counter()-t0)/iters*1e3
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.1f} ms/iter", flush=True)

@jax.jit
def full(x):
    idx, cnt = bq.ball_query(x, ctr, 0.8, 64)
    return x + (jnp.sum(cnt) + jnp.sum(idx)).astype(jnp.float32) * 1e-9
timeloop(full, xyz, "ball_query r=.8 ns=64 16384x4096")

@jax.jit
def dist_only(x):
    def single(xi, ci):
        cs = ci.reshape(-1, 512, 3)
        def per_chunk(c):
            d2 = bq._pairwise_sqdist(c, xi)
            return jnp.sum(jnp.where(d2 < 0.64, 1, 0), axis=-1)
        return jax.lax.map(per_chunk, cs).reshape(-1)
    cnt = jax.vmap(single)(x, ctr)
    return x + jnp.sum(cnt).astype(jnp.float32) * 1e-9
timeloop(dist_only, xyz, "distance+count only")

@jax.jit
def grp(x):
    idx, cnt = bq.ball_query(x, ctr, 0.8, 64)
    feats = jnp.concatenate([x, x, x], axis=-1)  # (B,N,9) stand-in
    g = bq.group_points(feats, idx)
    return x + jnp.sum(g).astype(jnp.float32) * 1e-12
timeloop(grp, xyz, "ball_query + group(C=9)")
