"""CRAFT detector training: MSE on sigmoid(region/affinity) at half-res.

Parity with the reference CRAFTTrainer (kiri_ocr/detector/craft/
training.py:100-193): MSE loss on both sigmoid maps against Gaussian GT at
half resolution, Adam lr=1e-4, best/last checkpoints. Data comes from the
synthetic document generator with vectorized Gaussian GT
(data/docsynth.py, replacing craft/dataset.py's per-pixel Python loops).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.docsynth import DocumentGenerator, craft_ground_truth
from .net import craft_forward, init_craft_net, num_params


@dataclass
class CRAFTTrainConfig:
    steps: int = 2000
    batch_size: int = 8
    lr: float = 1e-4              # reference craft/training.py:120
    grad_clip: float = 5.0
    image_size: int = 640
    seed: int = 42
    khmer_ratio: float = 0.3   # fraction of Khmer lines in synthetic docs
    out_dir: str = "checkpoints_craft"
    log_every: int = 50
    pool_size: int = 256
    # Probability of degrading a doc with a robustness condition (GT maps
    # are rasterized AFTER the transform, so boxes stay consistent).
    aug_conditions: float = 0.0
    # Optional per-condition sampling weights (see db.train.pick_condition).
    aug_weights: Optional[Dict[str, float]] = None
    # Probability of drawing a doc rendered small and upscaled to image_size,
    # matching the serving path's canvas/mag_ratio magnification (predict_maps
    # upscales inputs ~1.5-2x; a fine-tune that only ever sees native-scale
    # glyphs degrades exactly there). Scale factors sampled from
    # scale_aug_factors.
    scale_aug: float = 0.0
    scale_aug_factors: Tuple[float, ...] = (1.5, 2.0)
    # Pre-generated dataset directory (generate-detector output). When set,
    # batches come from disk instead of the live generator — the reference's
    # `train-detector --data-yaml` path (detector/craft/training.py:196-223).
    data_dir: Optional[str] = None


def craft_loss(variables, batch):
    """batch: image [B,H,W,1], region_gt + affinity_gt at [B,H/2,W/2]."""
    region, affinity, new_stats = craft_forward(variables, batch["image"],
                                                train=True)
    r = jax.nn.sigmoid(region)
    a = jax.nn.sigmoid(affinity)
    loss = jnp.mean((r - batch["region_gt"]) ** 2) + \
        jnp.mean((a - batch["affinity_gt"]) ** 2)
    return loss, (new_stats, {"loss": loss})


_TRAIN_CONDITIONS = ("rotated", "noisy", "textured", "low_contrast")


def make_batch(gen: DocumentGenerator, batch_size: int, size: int,
               aug_conditions: float = 0.0,
               aug_weights: Optional[Dict[str, float]] = None,
               scale_aug: float = 0.0,
               scale_gens: Optional[List[DocumentGenerator]] = None,
               ) -> Dict[str, np.ndarray]:
    from ...data.docsynth import apply_condition, rescale_doc
    from ..db.train import pick_condition

    half = size // 2
    imgs = np.zeros((batch_size, size, size, 1), np.float32)
    regions = np.zeros((batch_size, half, half), np.float32)
    affs = np.zeros((batch_size, half, half), np.float32)
    for i in range(batch_size):
        if scale_aug and scale_gens and gen.rng.random() < scale_aug:
            # Render small, degrade at native scale (as a real capture
            # would be), THEN upscale — the order the serving path sees.
            small = scale_gens[gen.rng.randrange(len(scale_gens))]
            doc = small.generate()
            if aug_conditions and gen.rng.random() < aug_conditions:
                doc = apply_condition(
                    doc, pick_condition(gen.rng, aug_weights), gen.rng)
            doc = rescale_doc(doc, size, size)
        else:
            doc = gen.generate()
            if aug_conditions and gen.rng.random() < aug_conditions:
                doc = apply_condition(
                    doc, pick_condition(gen.rng, aug_weights), gen.rng)
        img = doc["image"].astype(np.float32)
        imgs[i, :, :, 0] = (img / 255.0 - 0.5) / 0.5
        region, aff = craft_ground_truth(doc["image"].shape, doc["chars"])
        regions[i] = region[::2, ::2]
        affs[i] = aff[::2, ::2]
    return {"image": imgs, "region_gt": regions, "affinity_gt": affs}


def train_craft(tc: CRAFTTrainConfig, verbose: bool = True,
                variables: Optional[Dict] = None) -> Dict:
    from . import save_craft_checkpoint

    gen = DocumentGenerator(tc.image_size, tc.image_size, seed=tc.seed,
                            khmer_ratio=tc.khmer_ratio)
    scale_gens = None
    if tc.scale_aug:
        scale_gens = [
            DocumentGenerator(int(round(tc.image_size / f)),
                              int(round(tc.image_size / f)),
                              seed=tc.seed + 17 * i, fonts=gen.fonts,
                              khmer_ratio=tc.khmer_ratio)
            for i, f in enumerate(tc.scale_aug_factors, 1)]
    if variables is None:
        variables = init_craft_net(jax.random.PRNGKey(tc.seed))
    if verbose:
        print(f"CRAFT net: {num_params(variables) / 1e6:.2f}M params")

    optimizer = optax.chain(optax.clip_by_global_norm(tc.grad_clip),
                            optax.adam(tc.lr))
    opt_state = optimizer.init(variables["params"])

    def step_fn(variables, opt_state, batch):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            craft_loss, has_aux=True)(variables, batch)
        updates, opt_state = optimizer.update(grads["params"], opt_state,
                                              variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        bs = dict(variables["batch_stats"])
        if new_stats:
            bs.update(new_stats)
        return {"params": params, "batch_stats": bs}, opt_state, metrics

    step_jit = jax.jit(step_fn, donate_argnums=(0, 1))

    pool: List[Dict[str, np.ndarray]] = []
    if tc.data_dir:
        from ...data.docsynth import load_detector_batches

        pool = load_detector_batches(tc.data_dir, "craft", tc.batch_size)
        if verbose:
            print(f"Loaded {len(pool)} batches from {tc.data_dir}")
    elif tc.pool_size:
        if verbose:
            print(f"Pre-generating {tc.pool_size} documents...")
        for _ in range((tc.pool_size + tc.batch_size - 1) // tc.batch_size):
            pool.append(make_batch(gen, tc.batch_size, tc.image_size,
                                   tc.aug_conditions, tc.aug_weights,
                                   tc.scale_aug, scale_gens))
    nprng = np.random.default_rng(tc.seed)

    out = Path(tc.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    best = np.inf
    t0 = time.time()
    for step in range(tc.steps):
        batch = (pool[int(nprng.integers(len(pool)))] if pool
                 else make_batch(gen, tc.batch_size, tc.image_size,
                                 tc.aug_conditions, tc.aug_weights,
                                 tc.scale_aug, scale_gens))
        variables, opt_state, metrics = step_jit(variables, opt_state, batch)
        loss = float(metrics["loss"])
        if verbose and tc.log_every and (step + 1) % tc.log_every == 0:
            print(f"  step {step + 1}/{tc.steps} loss={loss:.5f} "
                  f"({time.time() - t0:.0f}s)")
        if (step + 1) % 500 == 0 or step + 1 == tc.steps:
            save_craft_checkpoint(out / "last.safetensors", variables)
            if loss < best:
                best = loss
                save_craft_checkpoint(out / "best.safetensors", variables)
    return variables
