"""True gigapixel demo: a 32768² (1.07 GP) mosaic through the streamed
pipeline (VERDICT r2 "Next round" #7).

Workload shape: the headline geometry (ViT-S/8, window 384 / stride 128 —
sw_processing.py:235-258) scaled 28× in linear size: 254×254 = 64,516
overlapping tiles. segment_mosaic's one-shot graph would need ~38 GB for
the per-tile attention stack; pipeline.segment_mosaic_streamed keeps only
the uint8 mosaic (1.07 GB) + f32 attention canvas (4.3 GB) HBM-resident and
processes one tile-row per dispatch.

Prints per-phase wall times, MP/s, and peak HBM. Writes a 2048² preview of
the attention map + mask to /tmp/gigapixel/.

Usage: python tools/bench_gigapixel.py [--size 32768] [--preview 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass


def make_mosaic(size: int) -> np.ndarray:
    """OCM-like synthetic content at gigapixel scale without gigabytes of
    f64 RNG: a 4096² noise texture tiled, plus low-frequency structure so
    tiles differ and the global Otsu sees a real bimodal histogram."""
    rng = np.random.default_rng(0)
    tex = rng.normal(110, 35, (4096, 4096)).astype(np.float32)
    reps = -(-size // 4096)
    out = np.empty((size, size), np.uint8)
    yy = np.linspace(0, 2 * np.pi, size, dtype=np.float32)
    rowmod = (20 * np.sin(3 * yy)).astype(np.float32)
    colmod = (25 * np.cos(2 * yy)).astype(np.float32)
    for i in range(reps):
        y0, y1 = i * 4096, min((i + 1) * 4096, size)
        band = np.tile(tex[: y1 - y0], (1, reps))[:, :size]
        band = band + rowmod[y0:y1, None] + colmod[None, :]
        # bright "white matter" blobs on a coarse grid
        band[(np.arange(y0, y1)[:, None] // 2048 + np.arange(size)[None, :] // 2048) % 3 == 0] += 55
        out[y0:y1] = np.clip(band, 0, 255).astype(np.uint8)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32768)
    ap.add_argument("--preview", type=int, default=1)
    ap.add_argument("--no_progress", action="store_true",
                    help="disable per-band progress prints")
    ap.add_argument("--single_dispatch", action="store_true",
                    help="all bands in one fori_loop dispatch (experimental: "
                         "crashed the TPU worker at 254 bands)")
    ap.add_argument("--band_chunk", type=int, nargs="+", default=[1],
                    help="tile rows per dispatch (cuts relay round trips "
                         "K-fold; the all-bands sweep crashed the worker). "
                         "Several values sweep K over the same uploaded "
                         "mosaic and assert the mask digest is identical.")
    ap.add_argument("--repeats", type=int, default=1,
                    help="segmentations per K; reported segment_s is the "
                         "min (the first run of a K pays that K's band-"
                         "graph compile — >=2 separates compile from "
                         "steady-state)")
    args = ap.parse_args()

    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.models import vit

    size, window, stride = args.size, 384, 128
    cfg = vit.VIT_SMALL(patch_size=8)
    params = pl.cast_params(vit.init(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)

    t0 = time.time()
    cache = f"/tmp/giga_mosaic_{size}.npy"
    if os.path.exists(cache):
        host = np.load(cache, mmap_mode="r")
    else:
        host = make_mosaic(size)
        np.save(cache, host)
    t_gen = time.time() - t0
    print(f"synthesized {size}x{size} ({size * size / 1e9:.2f} GP) in {t_gen:.0f}s",
          flush=True)

    t0 = time.time()
    img_dev = jax.device_put(host)
    img_dev.block_until_ready()
    t_up = time.time() - t0
    print(f"upload: {t_up:.1f}s ({host.nbytes / 1e6 / max(t_up, 1e-9):.1f} MB/s)", flush=True)

    last = [time.time(), 0]

    def progress(done, total):
        if done % 16 == 0 or done == total:
            now = time.time()
            print(f"  band {done}/{total} (+{now - last[0]:.1f}s)", flush=True)
            last[0] = now

    # positional digest (device-side scalar, outside the timed window): a
    # weighted row/col checksum that differs if ANY pixel flips — lets a
    # band_chunk sweep assert bit-equal masks without 1 GB downloads

    @jax.jit
    def _digest(m):
        h, w = m.shape
        # 1-based position weights: arange alone gives weight 0 to row/col 0,
        # making the checksum blind to flips there (ADVICE r4); +1 keeps every
        # pixel position at a nonzero weight under both odd multipliers
        rw = ((jnp.arange(h, dtype=jnp.uint32) + jnp.uint32(1))
              * jnp.uint32(2654435761)) % jnp.uint32(1 << 24)
        cw = ((jnp.arange(w, dtype=jnp.uint32) + jnp.uint32(1))
              * jnp.uint32(40503)) % jnp.uint32(1 << 24)
        bits = (m > 0).astype(jnp.uint32)
        rows = jnp.sum(bits * cw[None, :], axis=1)  # (h,) per-row checksums
        return (jnp.sum(rows * rw) % jnp.uint32(1 << 31),
                jnp.sum(rows) % jnp.uint32(1 << 31))

    mp = size * size / 1e6
    n_tiles = ((size - window) // stride + 1) ** 2
    digests = {}
    mask = attn = None
    for bc in args.band_chunk:
        t_seg, t_first = 1e18, None
        for _ in range(max(args.repeats, 1)):
            t0 = time.time()
            mask, attn = pl.segment_mosaic_streamed(
                params, cfg, img_dev, window, stride, dtype=jnp.bfloat16,
                progress=None if args.no_progress else progress,
                single_dispatch=args.single_dispatch, band_chunk=bc)
            # scalar sync: all chained band dispatches + threshold executed
            fg = float((mask > 0).astype(jnp.float32).mean())
            dt = time.time() - t0
            if t_first is None:
                t_first = dt
            t_seg = min(t_seg, dt)
        d1, d2 = _digest(mask)
        digest = f"{int(d1):08x}-{int(d2):08x}"
        digests[bc] = digest
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0)
        result = {
            "mosaic": f"{size}x{size}",
            "gigapixels": round(size * size / 1e9, 3),
            "tiles": n_tiles,
            "band_chunk": bc,
            "upload_s": round(t_up, 1),
            "segment_s": round(t_seg, 1),
            "first_run_s": round(t_first, 1),
            "mp_per_s_device": round(mp / t_seg, 2),
            "mp_per_s_end_to_end": round(mp / (t_up + t_seg), 2),
            "ms_per_tile": round(t_seg * 1e3 / n_tiles, 3),
            "peak_hbm_gb": round(peak / 1e9, 2),
            "mask_fg_fraction": round(fg, 4),
            "mask_digest": digest,
        }
        print(json.dumps(result), flush=True)

    if len(digests) > 1:
        ref = next(iter(digests.values()))
        ok = all(d == ref for d in digests.values())
        print(json.dumps({"band_chunk_bit_equal": ok, "digests": digests}),
              flush=True)
        if not ok:
            return 1

    if args.preview:
        os.makedirs("/tmp/gigapixel", exist_ok=True)
        ds = max(size // 2048, 1)  # small smoke sizes: full-res preview
        from PIL import Image

        Image.fromarray(np.asarray(mask[::ds, ::ds])).save("/tmp/gigapixel/mask_preview.png")
        a = np.asarray(attn[::ds, ::ds])
        a = ((a - a.min()) / max(a.max() - a.min(), 1e-9) * 255).astype(np.uint8)
        Image.fromarray(a).save("/tmp/gigapixel/attn_preview.png")
        print("previews written to /tmp/gigapixel/", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
