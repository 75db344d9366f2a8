import time, numpy as np, jax, jax.numpy as jnp
from de6d_tpu.ops import sampling
B, N = 8, 16384
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.uniform(-40, 40, (B, N, 3)).astype(np.float32))
w = jnp.asarray(rng.uniform(0.1, 1, (B, N)).astype(np.float32))

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
def dfps(x):
    idx = sampling.farthest_point_sample(x, 4096)
    # chain: perturb coords by a real function of the output
    return x + jnp.sum(idx).astype(jnp.float32) * 1e-9

timeloop(dfps, xyz, "d-fps 16384->4096 (B=8)")

@jax.jit
def sfps(x):
    idx = sampling.weighted_farthest_point_sample(x, w, 1024)
    return x + jnp.sum(idx).astype(jnp.float32) * 1e-9
timeloop(sfps, xyz, "s-fps 16384->1024 (B=8)")

@jax.jit
def sfps2(x):
    idx = sampling.weighted_farthest_point_sample(x[:, :4096], w[:, :4096], 1024)
    return x.at[:, :4096].add(jnp.sum(idx).astype(jnp.float32) * 1e-9)
timeloop(sfps2, xyz, "s-fps 4096->1024 (B=8)")
