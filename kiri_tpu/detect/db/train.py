"""DB detector training: balanced BCE + dice + threshold L1, data-parallel.

The reference ships its DB model as a pre-trained ONNX file with no training
path (SURVEY §2: DB is inference-only there; only CRAFT has a trainer). This
module closes that gap: the first-party JAX DB net (net.py) trains on the
synthetic document generator (data/docsynth.py) or any dataset providing
(image, prob_gt, thresh_gt, thresh_mask).

Loss (standard DB formulation):
  L = L_prob (balanced BCE, 3:1 hard-negative mining)
    + alpha * L_binary (dice on b = sigmoid(k (p - t)))
    + beta * L_thresh (L1 inside the border band)
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.docsynth import DocumentGenerator, db_ground_truth
from ...parallel import make_mesh, shard_batch, shard_variables
from .net import db_forward, init_db_net, num_params


@dataclass
class DBTrainConfig:
    steps: int = 2000
    batch_size: int = 8
    lr: float = 2e-3
    weight_decay: float = 1e-4
    grad_clip: float = 5.0
    image_size: int = 640
    k: float = 50.0          # DB binarization steepness
    alpha: float = 1.0       # binary (dice) weight
    beta: float = 10.0       # threshold L1 weight
    neg_ratio: float = 3.0   # OHEM negative:positive
    seed: int = 42
    khmer_ratio: float = 0.3   # fraction of Khmer lines in synthetic docs
    out_dir: str = "checkpoints_db"
    log_every: int = 50
    n_devices: Optional[int] = None
    # Pre-generated document pool reused across steps (0 = fresh docs every
    # step). Rendering + GT rasterization is host-bound; a pool keeps the
    # TPU fed.
    pool_size: int = 512
    # Probability of degrading a training doc with a robustness condition
    # (rotation/noise/texture/low-contrast; GT boxes transform with the
    # image). Round-3 eval showed the clean-trained net drops to 0.81-0.86
    # recall under rotation/low-contrast — see scripts/eval_detector.py.
    aug_conditions: float = 0.0
    # Optional per-condition sampling weights (name -> weight, default 1.0
    # each); lets a continuation over-sample a weak condition (e.g. rotated).
    aug_weights: Optional[Dict[str, float]] = None
    # Pre-generated dataset directory (generate-detector output). When set,
    # batches come from disk instead of the live generator — the reference's
    # `train-detector --data-yaml` path (detector/craft/training.py:196-223).
    data_dir: Optional[str] = None


def db_loss(variables, batch, *, k: float, alpha: float, beta: float,
            neg_ratio: float):
    """batch: image [B,H,W,1] f32 (-1..1), prob_gt, thresh_gt, tmask [B,H,W]."""
    prob, thresh, new_stats = db_forward(variables, batch["image"], train=True)
    gt = batch["prob_gt"]

    # Balanced BCE with online hard negative mining.
    eps = 1e-6
    bce = -(gt * jnp.log(prob + eps) + (1 - gt) * jnp.log(1 - prob + eps))
    pos = gt > 0.5
    n_pos = jnp.maximum(1, jnp.sum(pos))
    n_neg = jnp.minimum(jnp.sum(~pos), (neg_ratio * n_pos).astype(jnp.int32))
    pos_loss = jnp.sum(jnp.where(pos, bce, 0.0)) / n_pos
    neg_vals = jnp.where(pos, -jnp.inf, bce).reshape(-1)
    # Top-k hard negatives; k must be static -> use a fixed fraction and mask.
    k_neg = neg_vals.shape[0] // 4
    top_neg, _ = jax.lax.top_k(neg_vals, k_neg)
    rank = jnp.arange(k_neg)
    neg_loss = jnp.sum(jnp.where(rank < n_neg, top_neg, 0.0)) / jnp.maximum(1, n_neg)
    l_prob = pos_loss + neg_loss

    # Dice on the differentiable binary map.
    b = jax.nn.sigmoid(k * (prob - thresh))
    inter = jnp.sum(b * gt)
    l_bin = 1.0 - 2.0 * inter / (jnp.sum(b) + jnp.sum(gt) + eps)

    # L1 on the threshold map inside the border band.
    tm = batch["tmask"]
    l_thr = jnp.sum(jnp.abs(thresh - batch["thresh_gt"]) * tm) / \
        jnp.maximum(1.0, jnp.sum(tm))

    loss = l_prob + alpha * l_bin + beta * l_thr
    metrics = {"loss": loss, "prob_loss": l_prob, "bin_loss": l_bin,
               "thresh_loss": l_thr}
    return loss, (new_stats, metrics)


def make_db_train_step(tc: DBTrainConfig, optimizer):
    def step(variables, opt_state, batch, rng):
        grad_fn = jax.value_and_grad(db_loss, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            variables, batch, k=tc.k, alpha=tc.alpha, beta=tc.beta,
            neg_ratio=tc.neg_ratio)
        grads = grads["params"]
        updates, opt_state = optimizer.update(grads, opt_state,
                                              variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        bs = dict(variables["batch_stats"])
        if new_stats:
            bs.update(new_stats)
        return {"params": params, "batch_stats": bs}, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


_TRAIN_CONDITIONS = ("rotated", "noisy", "textured", "low_contrast")
# "inverted" is deliberately absent: inference normalizes polarity up front
# (invert-if-dark in DBDetector.detect / CRAFT predict_maps).


def pick_condition(rng, weights: Optional[Dict[str, float]] = None) -> str:
    """Sample a training condition, optionally weighted (uniform default)."""
    if weights:
        w = [float(weights.get(c, 1.0)) for c in _TRAIN_CONDITIONS]
        return rng.choices(_TRAIN_CONDITIONS, weights=w)[0]
    return rng.choice(_TRAIN_CONDITIONS)


def make_batch(gen: DocumentGenerator, batch_size: int,
               size: int, aug_conditions: float = 0.0,
               aug_weights: Optional[Dict[str, float]] = None,
               ) -> Dict[str, np.ndarray]:
    from ...data.docsynth import apply_condition

    imgs = np.zeros((batch_size, size, size, 1), np.float32)
    probs = np.zeros((batch_size, size, size), np.float32)
    threshs = np.zeros((batch_size, size, size), np.float32)
    tmasks = np.zeros((batch_size, size, size), np.float32)
    for i in range(batch_size):
        doc = gen.generate()
        if aug_conditions and gen.rng.random() < aug_conditions:
            doc = apply_condition(doc, pick_condition(gen.rng, aug_weights),
                                  gen.rng)
        img = doc["image"].astype(np.float32)
        imgs[i, :, :, 0] = (img / 255.0 - 0.5) / 0.5
        p, t, m = db_ground_truth(doc["image"].shape, doc["lines"])
        probs[i], threshs[i], tmasks[i] = p, t, m
    return {"image": imgs, "prob_gt": probs, "thresh_gt": threshs,
            "tmask": tmasks}


def train_db(tc: DBTrainConfig, verbose: bool = True,
             variables: Optional[Dict] = None) -> Dict:
    """Train the DB net on synthetic documents; returns final variables."""
    from . import save_db_checkpoint

    gen = DocumentGenerator(tc.image_size, tc.image_size, seed=tc.seed,
                            khmer_ratio=tc.khmer_ratio)
    if variables is None:
        variables = init_db_net(jax.random.PRNGKey(tc.seed))
    if verbose:
        print(f"DB net: {num_params(variables) / 1e6:.2f}M params")

    schedule = optax.cosine_decay_schedule(tc.lr, tc.steps, alpha=0.05)
    optimizer = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(schedule, weight_decay=tc.weight_decay))
    opt_state = optimizer.init(variables["params"])
    step_fn = make_db_train_step(tc, optimizer)

    pool: List[Dict[str, np.ndarray]] = []
    if tc.data_dir:
        from ...data.docsynth import load_detector_batches

        pool = load_detector_batches(tc.data_dir, "db", tc.batch_size)
        if verbose:
            print(f"Loaded {len(pool)} batches from {tc.data_dir}")
    elif tc.pool_size:
        if verbose:
            print(f"Pre-generating {tc.pool_size} documents...")
        for _ in range((tc.pool_size + tc.batch_size - 1) // tc.batch_size):
            pool.append(make_batch(gen, tc.batch_size, tc.image_size,
                                   tc.aug_conditions, tc.aug_weights))
    nprng = np.random.default_rng(tc.seed)

    out = Path(tc.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(tc.seed)
    t0 = time.time()
    for step in range(tc.steps):
        if pool:
            batch = pool[int(nprng.integers(len(pool)))]
        else:
            batch = make_batch(gen, tc.batch_size, tc.image_size,
                               tc.aug_conditions, tc.aug_weights)
        rng, sub = jax.random.split(rng)
        variables, opt_state, metrics = step_fn(variables, opt_state,
                                                batch, sub)
        if verbose and tc.log_every and (step + 1) % tc.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"  step {step + 1}/{tc.steps} loss={m['loss']:.4f} "
                  f"prob={m['prob_loss']:.4f} bin={m['bin_loss']:.4f} "
                  f"thr={m['thresh_loss']:.4f} ({time.time() - t0:.0f}s)")
        if (step + 1) % 500 == 0 or step + 1 == tc.steps:
            save_db_checkpoint(out / "detector.safetensors", variables)
    return variables
