import time, numpy as np, jax, jax.numpy as jnp
from de6d_tpu.ops import ball_query as bq
B, N, M, K = 8, 16384, 4096, 64
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

def variant(x, mode):
    def single(xi, ci):
        cs = ci.reshape(-1, 512, 3)
        def per_chunk(c):
            d2 = bq._pairwise_sqdist(c, xi)
            in_ball = d2 < 0.64
            if mode == "cumsum":
                rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1)
                return jnp.sum(rank, axis=-1)
            if mode == "search_fake":
                rank = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], in_ball.shape) * in_ball.astype(jnp.int32)
                ks = jnp.arange(1, K + 1, dtype=jnp.int32)
                lo = jnp.zeros((512, K), jnp.int32); hi = jnp.full((512, K), N, jnp.int32)
                for _ in range(14):
                    mid = (lo + hi) >> 1
                    rv = jnp.take_along_axis(rank, mid, axis=-1)
                    gr = rv < ks[None, :]
                    lo = jnp.where(gr, mid + 1, lo); hi = jnp.where(gr, hi, mid)
                return jnp.sum(hi, axis=-1)
            if mode == "cumsum2l":
                blk = 512
                ib = in_ball.astype(jnp.int32).reshape(512, N // blk, blk)
                within = jnp.cumsum(ib, axis=-1)
                bsum = within[:, :, -1]
                prefix = jnp.cumsum(bsum, axis=-1) - bsum
                rank = (within + prefix[:, :, None]).reshape(512, N)
                return jnp.sum(rank, axis=-1)
        return jax.lax.map(per_chunk, cs).reshape(-1)
    out = jax.vmap(single)(x, ctr)
    return x + jnp.sum(out).astype(jnp.float32) * 1e-9

import functools
for m in ("cumsum", "search_fake", "cumsum2l"):
    f = jax.jit(functools.partial(variant, mode=m))
    timeloop(f, xyz, m)
