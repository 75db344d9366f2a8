import time, numpy as np, jax, jax.numpy as jnp
from de6d_tpu.config import cfg, cfg_from_yaml_file
cfg_from_yaml_file("configs/slopedkitti_models/det6d_car.yaml", cfg)
from de6d_tpu.models import build_network
from de6d_tpu.models.detectors.detector3d_template import DatasetSpec
spec = DatasetSpec(class_names=tuple(cfg.CLASS_NAMES), point_feature_dim=4,
                   point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
                   voxel_size=(0.1,0.1,0.15), max_voxels=16000, max_points_per_voxel=5)
model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)
B, N = 8, 16384
rng = np.random.RandomState(0); pc = spec.point_cloud_range
pts = np.zeros((B,N,4), np.float32)
pts[...,0]=rng.uniform(pc[0],pc[3],(B,N)); pts[...,1]=rng.uniform(pc[1],pc[4],(B,N))
pts[...,2]=rng.uniform(pc[2],pc[5],(B,N))
gt = np.zeros((B, 16, 10), np.float32)
for b in range(B):
    for g in range(8):
        gt[b, g] = [rng.uniform(5,55), rng.uniform(-25,25), -1, 3.9,1.6,1.56, rng.uniform(-3,3), 0, 0, 1]
pts_j, mask_j, gt_j = jnp.asarray(pts), jnp.ones((B,N),bool), jnp.asarray(gt)
bd0 = {"points": pts_j, "points_mask": mask_j, "gt_boxes": gt_j}
variables = jax.jit(lambda r, b: model.init(r, b, train=False))(jax.random.PRNGKey(0), dict(bd0))
params, stats = variables["params"], variables.get("batch_stats", {})

def timeloop(f, x0, label, iters=5, loops=3):
    x = f(x0); jax.block_until_ready(x)
    best = None
    for k in range(loops):
        t0 = time.perf_counter(); s = x
        for _ in range(iters):
            s = f(s)
        jax.block_until_ready(s)
        dt = (time.perf_counter()-t0)/iters*1e3
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.1f} ms/iter", flush=True)

@jax.jit
def fwd_eval(p):
    bd = {"points": p, "points_mask": mask_j, "gt_boxes": gt_j}
    out = model.apply({"params": params, **({"batch_stats": stats} if stats else {})}, bd, train=False)
    key = "batch_box_preds" if "batch_box_preds" in out else sorted(out.keys())[0]
    l = jnp.sum(jnp.abs(out[key]))
    return p + jnp.clip(l, 0, 10) * 1e-6
timeloop(fwd_eval, pts_j, "det6d fwd eval")

@jax.jit
def fwd_loss(p):
    bd = {"points": p, "points_mask": mask_j, "gt_boxes": gt_j}
    v = {"params": params}
    if stats: v["batch_stats"] = stats
    out, _ = model.apply(v, bd, train=True, mutable=["batch_stats"])
    loss, _ = model.get_training_loss(out)
    return p + jnp.clip(loss, 0, 10) * 1e-4
timeloop(fwd_loss, pts_j, "det6d fwd+loss")

@jax.jit
def fwd_bwd(p):
    def loss_fn(prm):
        bd = {"points": p, "points_mask": mask_j, "gt_boxes": gt_j}
        v = {"params": prm}
        if stats: v["batch_stats"] = stats
        out, _ = model.apply(v, bd, train=True, mutable=["batch_stats"])
        loss, _ = model.get_training_loss(out)
        return loss
    loss, g = jax.value_and_grad(loss_fn)(params)
    gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    return p + jnp.clip(loss + gn * 0 + loss, 0, 10) * 1e-4
timeloop(fwd_bwd, pts_j, "det6d fwd+bwd")
