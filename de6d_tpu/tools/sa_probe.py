"""SA-layer micro-bench on the real chip: brute vs binned query, and
standard vs fused inference, at Det6D SA1/SA2 scales.

Chained-dependency protocol (STATUS.md): each timed iteration's input
is perturbed by a function of the previous output, ending with a host
fetch, so the tunnel can neither memoize nor overlap.

Usage: python -m de6d_tpu.tools.sa_probe [--layer sa1|sa2] [--iters 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

LAYERS = {
    # B, N, M, C_in, radii, nsamples, mlps
    "sa1": (8, 16384, 4096, 1, (0.2, 0.4, 0.8), (32, 32, 64),
            ((16, 16, 32), (16, 16, 32), (32, 32, 64))),
    "sa2": (8, 4096, 1024, 64, (0.4, 0.8, 1.6), (32, 32, 64),
            ((64, 64, 128), (64, 64, 128), (64, 96, 128))),
}
PC_RANGE = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", default="sa1", choices=list(LAYERS))
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from de6d_tpu.ops import ball_query as bq
    from de6d_tpu.ops import binned

    b, n, m, c_in, radii, nsamples, mlps = LAYERS[args.layer]
    r_ins = (0.0,) + radii[:-1]  # dilated groups like Det6D
    rng = np.random.RandomState(0)
    pc = PC_RANGE
    pts = np.stack(
        [
            rng.uniform(pc[0], pc[3], (b, n)),
            rng.uniform(pc[1], pc[4], (b, n)),
            rng.uniform(pc[2], pc[5], (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    # half the points clustered (cars/walls) for realistic cell skew
    k = n // 2
    cl = rng.uniform(5, 40, (b, 12, 3)).astype(np.float32)
    which = rng.randint(0, 12, (b, k))
    for i in range(b):
        pts[i, :k] = cl[i, which[i]] + rng.normal(0, 0.8, (k, 3))
        pts[i, :k, 2] = rng.uniform(-1.7, 0.5, k)
    xyz = jnp.asarray(pts)
    feats = jnp.asarray(rng.randn(b, n, c_in).astype(np.float32))
    ctr_idx = rng.choice(n, m, replace=False)
    new_xyz = jnp.asarray(pts[:, ctr_idx])
    folded = tuple(
        tuple(
            (jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1),
             jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1))
            for cin, cout in zip((3 + c_in,) + tuple(ch[:-1]), ch)
        )
        for ch in mlps
    )

    def timed(fn, label, fetch):
        """fn(xyz) -> outputs; chained via an output-dependent eps."""
        x = xyz
        out = fn(x)
        eps0 = (fetch(out).astype(jnp.float32) * 1e-9 + 1e-4)
        x = x + eps0.astype(x.dtype)
        np.asarray(fetch(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
            eps = (fetch(out).astype(jnp.float32) * 1e-9 + 1e-4)
            x = x + eps.astype(x.dtype)
        np.asarray(fetch(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {label:42s}: {ms:8.2f} ms/batch", flush=True)
        return ms

    print(f"backend={jax.default_backend()} layer={args.layer} "
          f"B={b} N={n} M={m} C={c_in} radii={radii}", flush=True)

    @jax.jit
    def brute_query(x):
        return tuple(
            bq.ball_query(x, new_xyz, float(r), int(ns), radius_in=float(ri))
            for r, ri, ns in zip(radii, r_ins, nsamples)
        )

    timed(brute_query, "brute ball_query x3", lambda o: o[0][1][0, 0])

    for cap, chunk in ((128, 1024), (64, 1024)):
        fn = jax.jit(lambda x, cap=cap, chunk=chunk: binned.binned_msg_query(
            x, new_xyz, radii, nsamples, pc_range=PC_RANGE, cell_cap=cap,
            center_chunk=chunk,
        ))
        ms = timed(fn, f"binned_msg_query cap={cap} chunk={chunk}",
                   lambda o: o[0][0][1][0, 0])
        over = np.asarray(fn(xyz)[1])
        print(f"      overflow={over.tolist()}", flush=True)

    @jax.jit
    def standard_sa(x):
        # brute query + wide gather + folded MLP + pool (the pre-fused
        # eval pipeline, minus flax overhead)
        return binned.brute_sa_infer(
            x, feats, new_xyz, folded, None, None, radii=radii,
            nsamples=nsamples, radius_in_list=r_ins,
        )

    timed(standard_sa, "standard: brute+gather+MLP+pool",
          lambda o: o[0][0][0, 0, 0])

    for cap, chunk in ((128, 128), (128, 512), (64, 512), (64, 1024)):
        fn = jax.jit(
            lambda x, cap=cap, chunk=chunk: binned.binned_sa_infer(
                x, feats, new_xyz, folded, None, None, radii=radii,
                nsamples=nsamples, radius_in_list=r_ins,
                pc_range=PC_RANGE, cell_cap=cap, center_chunk=chunk,
            )
        )
        timed(fn, f"fused binned_sa_infer cap={cap} chunk={chunk}",
              lambda o: o[0][0][0, 0, 0])

    # --- cost attribution inside the fused path (cap=128, chunk=128) ---
    # identity fold: MLP cost removed, everything else identical
    ident = tuple(
        ((jnp.eye(3 + c_in, dtype=jnp.float32),
          jnp.zeros((3 + c_in,), jnp.float32)),)
        for _ in mlps
    )
    fn = jax.jit(lambda x: binned.binned_sa_infer(
        x, feats, new_xyz, ident, None, None, radii=radii,
        nsamples=nsamples, radius_in_list=r_ins,
        pc_range=PC_RANGE, cell_cap=128, center_chunk=128,
    ))
    timed(fn, "ablate: identity MLP (no MLP cost)", lambda o: o[0][0][0, 0, 0])

    # selection replaced by a static slice (WRONG results — pure cost
    # attribution for the 3x top_k exact select)
    fn = jax.jit(lambda x: binned.binned_sa_infer(
        x, feats, new_xyz, folded, None, None, radii=radii,
        nsamples=nsamples, radius_in_list=r_ins,
        pc_range=PC_RANGE, cell_cap=128, center_chunk=128,
        _ablate_select=True,
    ))
    timed(fn, "ablate: slice select (no top_k cost)",
          lambda o: o[0][0][0, 0, 0])

    # no feature fetch: use_xyz-only grouping (feature-gather cost)
    fn = jax.jit(lambda x: binned.binned_sa_infer(
        x, None, new_xyz, tuple(
            tuple((w[:3] if wi == 0 else w, b) for wi, (w, b) in enumerate(f))
            for f in folded
        ), None, None, radii=radii,
        nsamples=nsamples, radius_in_list=r_ins,
        pc_range=PC_RANGE, cell_cap=128, center_chunk=128,
    ))
    timed(fn, "ablate: xyz-only (no feature gather)",
          lambda o: o[0][0][0, 0, 0])


if __name__ == "__main__":
    main()
