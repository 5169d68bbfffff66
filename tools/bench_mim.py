"""MIM training-step benchmark: ms/iter + MFU (VERDICT r1 item 10).

Measures the jitted MIM train step (fwd+bwd+clip+AdamW) on the real chip at:
  * the reference's pretrain scale (224^2, batch 60, depth-4 ViT-S/8) —
    the BENCH.md ms/iter row;
  * the reference's actual mim.yaml config scale (384^2) with remat on/off
    and the largest batch that fits.

MFU = model FLOPs (3x forward, the standard fwd+bwd accounting) / wall /
peak. v5e bf16 peak = 197 TF/s.

Usage: python tools/bench_mim.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.models import simmim
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
from vit_ocm_wmsegmentation_tpu.train.mim_trainer import make_train_step
from vit_ocm_wmsegmentation_tpu.train.optim import build_optimizer
from vit_ocm_wmsegmentation_tpu.utils.config import default_config

PEAK_BF16 = 197e12


def vit_forward_flops(cfg: ViTConfig, img: int, batch: int) -> float:
    """Dense FLOPs of one SimMIM forward (matmuls only, 2 FLOP/MAC)."""
    n = (img // cfg.patch_size) ** 2 + 1
    d, h = cfg.embed_dim, cfg.mlp_ratio if hasattr(cfg, "mlp_ratio") else 4
    mlp_hidden = int(d * h)
    per_block = (
        2 * n * d * (3 * d)      # qkv
        + 2 * 2 * n * n * d      # qk^T and pv
        + 2 * n * d * d          # proj
        + 2 * 2 * n * d * mlp_hidden  # mlp
    )
    patch = 2 * n * (cfg.patch_size**2 * 3) * d  # patch embed
    dec = 2 * n * d * (cfg.patch_size**2 * 3)    # pixel-shuffle decoder conv
    return batch * (cfg.depth * per_block + patch + dec)


def bench(img, batch, *, remat=False, amp=False, iters=10):
    vit_cfg = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                        pretrain_img_size=img)
    params = simmim.init(vit_cfg, jax.random.PRNGKey(0))
    cfg = default_config()
    cfg.TRAIN.USE_CHECKPOINT = remat
    tx = build_optimizer(cfg, params, lambda t: 1e-4)
    opt_state = tx.init(params)
    step = make_train_step(vit_cfg, tx, remat=remat, amp=amp)

    rng = np.random.default_rng(0)
    g = img // 8
    x = jnp.asarray(rng.random((batch, img, img, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((batch, g, g)) > 0.5).astype(np.int32))

    for _ in range(2):  # warmup must sync on the scalar (tunnel quirk)
        params, opt_state, loss, gn = step(params, opt_state, x, mask)
        _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss, gn = step(params, opt_state, x, mask)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / iters

    flops = 3 * vit_forward_flops(vit_cfg, img, batch)
    return {
        "img": img, "batch": batch, "remat": remat, "amp": amp,
        "ms_per_iter": round(dt * 1e3, 1),
        "model_tflops_per_step": round(flops / 1e12, 2),
        "mfu_pct": round(100 * flops / dt / PEAK_BF16, 1),
        "samples_per_s": round(batch / dt, 1),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--amp_only", action="store_true",
                    help="run only the AMP (bf16 compute) rows")
    opts = ap.parse_args()
    rows = [(224, 60, False, True), (384, 60, True, True), (384, 128, True, True)]
    if not opts.amp_only:
        rows = [(224, 60, False, False), (384, 60, False, False),
                (384, 60, True, False), (384, 128, True, False)] + rows
    for img, batch, remat, amp in rows:
        try:
            print(json.dumps(bench(img, batch, remat=remat, amp=amp)), flush=True)
        except Exception as e:
            print(json.dumps({"img": img, "batch": batch, "remat": remat, "amp": amp,
                              "error": f"{type(e).__name__}: {str(e)[:150]}"}), flush=True)


if __name__ == "__main__":
    main()
