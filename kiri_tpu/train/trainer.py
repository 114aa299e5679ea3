"""Recognizer training: hybrid CTC + cross-entropy, data-parallel over a mesh.

Feature parity with the reference trainer (kiri_ocr/training.py:356-1000):
hybrid 0.5*CTC + 0.5*CE loss, AdamW(lr=3e-4, wd=0.01, betas=(0.9, 0.98)),
OneCycle cosine schedule with warmup=min(4000, steps/10), grad-clip 1.0,
resume from latest checkpoint, CTC exact-match validation plus sampled AR
decode with divergence warning, step/epoch/best checkpoints and history.json.

TPU-first design (no reference equivalent — the reference is single-device):

* one jitted ``train_step`` whose batch is sharded over the mesh's data axis;
  XLA inserts the gradient all-reduce (psum over ICI) automatically.
* BatchNorm statistics are computed over the *global* batch (the mean over a
  sharded axis is a collective), so DP training is bit-identical to
  single-device training at the same global batch size.
* inputs are uint8 host-side; normalization happens on device inside the
  jitted step (fused with the stem conv by XLA).
"""
from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CFG
from ..models import recognizer as R
from ..ops.ctc import ctc_loss
from ..parallel import (DATA_AXIS, batch_shardings, make_mesh,
                        pad_batch_to_devices, shard_batch,
                        shard_batch_global, shard_variables,
                        variable_shardings)
from ..tokenizer import CharTokenizer
from .checkpoints import load_checkpoint, load_opt_state, save_checkpoint


@dataclass
class TrainConfig:
    """Trainer hyperparameters (reference flag surface, kiri_ocr/cli.py train)."""

    epochs: int = 10
    batch_size: int = 32
    lr: float = 3e-4
    weight_decay: float = 0.01
    betas: Tuple[float, float] = (0.9, 0.98)
    grad_clip: float = 1.0
    warmup_steps: int = 4000
    ctc_weight: float = 0.5
    dec_weight: float = 0.5
    max_seq_len: int = 512
    save_steps: int = 0            # 0 = only per-epoch checkpoints
    out_dir: str = "checkpoints"
    seed: int = 42
    val_every: int = 1             # validate every N epochs
    n_devices: Optional[int] = None
    model_parallel: int = 1
    log_every: int = 50
    select_metric: str = "ctc"     # best-ckpt criterion: ctc | ar | mean
    train_only: Optional[str] = None   # None=all | "decoder" (freeze enc+CTC)
    dec_input_noise: float = 0.0   # P(replace a decoder-input token) — fights
    #                                exposure bias: the AR head is trained
    #                                teacher-forced but serves on its own
    #                                (possibly wrong) prefix.


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------
#: Top-level param keys that feed ONLY the AR/beam decode path.  `mem_proj`
#: belongs here: the CTC head reads encoder memory directly
#: (`R.ctc_logits`), so training it cannot move the fast path.
DECODER_PARAM_KEYS = ("mem_proj", "dec_emb", "dec_layers", "dec_ln",
                     "dec_head", "lm_head")


def hybrid_loss(variables: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                rng, *, cfg: CFG, dec_pad: int, ctc_weight: float,
                dec_weight: float, train_only: Optional[str] = None,
                dec_input_noise: float = 0.0, dec_vocab: int = 0):
    """0.5*CTC + 0.5*CE with BatchNorm stat updates.

    batch: image [B,H,W] u8, ctc_target [B,Lc] i32, ctc_len [B] i32,
           dec_inp [B,Ld] i32 (bos..), dec_tgt [B,Ld] i32 (..eos, pad=0).
    Returns (loss, (new_batch_stats, metrics)).

    ``train_only="decoder"`` runs the encoder in eval mode (running BN
    stats, no dropout — the exact distribution the decoder sees at serve
    time) under ``stop_gradient``, and skips the CTC loss entirely; the
    caller is expected to freeze the matching params via
    ``make_optimizer(..., train_only=...)``.

    ``dec_input_noise`` replaces that fraction of real decoder-input tokens
    (never pad/bos) with uniform-random characters while keeping targets
    intact — scheduled-sampling-style exposure-bias training in one
    teacher-forced pass.
    """
    r_enc, r_ctc, r_dec, r_noise = jax.random.split(rng, 4)
    dec_only = train_only == "decoder"
    mem, new_stats = R.encode(variables, batch["image"], cfg,
                              train=not dec_only,
                              rng=None if dec_only else r_enc)
    if dec_only:
        mem = jax.lax.stop_gradient(mem)
    b, t_mem, _ = mem.shape

    metrics = {}
    loss = jnp.asarray(0.0, jnp.float32)
    if cfg.USE_CTC and not dec_only:
        logits = R.ctc_logits(variables["params"], mem, cfg, train=True, rng=r_ctc)
        frame_lens = jnp.full((b,), t_mem, jnp.int32)
        l_ctc = ctc_loss(logits, frame_lens, batch["ctc_target"], batch["ctc_len"])
        loss = loss + ctc_weight * l_ctc
        metrics["ctc_loss"] = l_ctc

    dec_inp = batch["dec_inp"]
    if dec_input_noise > 0.0 and dec_vocab > 3:
        replace = (jax.random.uniform(r_noise, dec_inp.shape) < dec_input_noise)
        replace = replace & (dec_inp > 2)  # keep pad=0 / bos=1 / eos=2
        rand_ids = jax.random.randint(
            jax.random.fold_in(r_noise, 1), dec_inp.shape, 3, dec_vocab,
            dtype=dec_inp.dtype)
        dec_inp = jnp.where(replace, rand_ids, dec_inp)

    memp = R.mem_project(variables["params"], mem)
    dec_logits = R.decoder_train_logits(variables, memp, dec_inp, cfg,
                                        train=True, rng=r_dec)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        dec_logits, batch["dec_tgt"])
    mask = (batch["dec_tgt"] != dec_pad).astype(jnp.float32)
    l_dec = jnp.sum(ce * mask) / jnp.maximum(1.0, jnp.sum(mask))
    loss = loss + dec_weight * l_dec
    metrics["dec_loss"] = l_dec
    metrics["loss"] = loss
    return loss, (new_stats, metrics)


def make_optimizer(tc: TrainConfig, total_steps: int):
    warmup = min(tc.warmup_steps, max(1, total_steps // 10))
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 2),
        peak_value=tc.lr,
        pct_start=warmup / max(total_steps, 2),
        div_factor=25.0, final_div_factor=1e4)
    # The learning rate is NOT baked into the transformation: the schedule
    # runs on host and the current lr enters the jitted step as a device
    # scalar (make_train_step / run_step). Baking optax's schedule into the
    # program made (lr, total_steps) compile-time constants, so every recipe
    # change recompiled the whole (width x length) program set — minutes per
    # shape on a tunneled backend. The chain below reproduces optax.adamw
    # exactly with the final scale_by_learning_rate(-lr) multiply deferred
    # to the step (one multiply, so numerics match adamw bit-for-bit).
    opt = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.scale_by_adam(b1=tc.betas[0], b2=tc.betas[1]),
        optax.add_decayed_weights(tc.weight_decay),
    )
    if tc.train_only == "decoder":
        # Hard-freeze everything outside the AR decode path.  set_to_zero
        # (not grad masking) so AdamW's weight decay cannot shrink frozen
        # params either — fast/CTC outputs stay bit-identical.
        def labels(params):
            return {k: jax.tree.map(
                        lambda _: "train" if k in DECODER_PARAM_KEYS
                        else "freeze", v)
                    for k, v in params.items()}
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels)
    return opt, schedule


# ---------------------------------------------------------------------------
# Train step (jit; data-parallel via sharded batch)
# ---------------------------------------------------------------------------
def make_train_step(cfg: CFG, tok: CharTokenizer, optimizer,
                    tc: TrainConfig, mesh=None):
    """Returns jitted fn(variables, opt_state, batch, rng) -> (vars, opt, metrics)."""

    def step(variables, opt_state, batch, rng, lr):
        grad_fn = jax.value_and_grad(hybrid_loss, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            variables, batch, rng, cfg=cfg, dec_pad=tok.dec_pad,
            ctc_weight=tc.ctc_weight, dec_weight=tc.dec_weight,
            train_only=tc.train_only, dec_input_noise=tc.dec_input_noise,
            dec_vocab=tok.dec_vocab)
        grads = grads["params"]
        updates, opt_state = optimizer.update(
            grads, opt_state, variables["params"])
        # Deferred schedule scaling (see make_optimizer): updates leave the
        # chain pre-negated, the host-computed lr lands here as a scalar.
        updates = jax.tree.map(lambda u: u * (-lr), updates)
        new_params = optax.apply_updates(variables["params"], updates)
        # Merge updated BatchNorm running stats (None in decoder-only mode —
        # the frozen encoder keeps its serving statistics).
        bs = dict(variables["batch_stats"])
        if new_stats and new_stats.get("stem"):
            merged_stem = dict(bs["stem"])
            merged_stem.update(new_stats["stem"])
            bs["stem"] = merged_stem
        new_vars = {"params": new_params, "batch_stats": bs,
                    "meta": variables["meta"]}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_vars, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    # Under a mesh we rely on input shardings (placed by the caller via
    # shard_variables / shard_batch); jit propagates them and inserts the
    # grad all-reduce over the data axis.
    return jax.jit(step, donate_argnums=(0, 1))


def ar_divergence_warning(ctc_acc: float, ar_acc: float,
                          threshold: float = 0.15) -> Optional[str]:
    """Reference semantics (kiri_ocr/training.py:~934): warn when the
    sampled AR-decoder accuracy lags CTC exact-match by >15 points."""
    if ctc_acc - ar_acc > threshold:
        return (f"⚠ AR decoder accuracy ({ar_acc * 100:.1f}%) lags CTC "
                f"({ctc_acc * 100:.1f}%) by more than "
                f"{threshold * 100:.0f} points — decoder head may be "
                f"undertrained or diverging.")
    return None


def make_eval_step(cfg: CFG):
    """Jitted CTC greedy ids for validation exact-match."""

    def step(variables, images):
        mem, _ = R.encode(variables, images, cfg, train=False)
        logits = R.ctc_logits(variables["params"], mem, cfg)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Host-side batching
# ---------------------------------------------------------------------------
def collate(samples: List[Dict[str, Any]], tok: CharTokenizer,
            max_seq_len: int = 512,
            img_hw: Optional[Tuple[int, int]] = None) -> Dict[str, np.ndarray]:
    """List of {image u8 [H,W], text} -> fixed-shape numpy batch.

    Truncates decoder targets at max_seq_len (reference collate,
    kiri_ocr/training.py:296-352). dec_inp is the bos-shifted input row,
    dec_tgt the eos-terminated target row (pad=0 everywhere). Variable-size
    images are resize-padded to ``img_hw`` (or to the first image's shape).
    """
    from ..ops.preprocess import resize_keep_ratio_pad_np

    imgs = [np.asarray(s["image"], dtype=np.uint8) for s in samples]
    if img_hw is None:
        shapes = {im.shape for im in imgs}
        img_hw = imgs[0].shape if len(shapes) == 1 else (
            max(im.shape[0] for im in imgs), max(im.shape[1] for im in imgs))
    imgs = [im if im.shape == tuple(img_hw)
            else resize_keep_ratio_pad_np(im, img_hw[0], img_hw[1])
            for im in imgs]
    images = np.stack(imgs)
    texts = [s["text"] for s in samples]
    enc_ctc = [tok.encode_ctc(t)[: max_seq_len - 1] for t in texts]
    enc_dec = [tok.encode_dec(t)[: max_seq_len] for t in texts]

    def _bucket(v: int) -> int:
        # Pad target lengths to multiples of 48 so XLA compiles a handful of
        # train-step shapes instead of one per batch. Granularity matters on
        # a tunneled backend: each (width, length) combo is a multi-minute
        # compile, and at the original 16-step grid the (4 widths) x (many
        # lc) x (many ld) cross-product dominated epoch wall clock (measured
        # ~13 s/step average vs 0.2 s/step warm).
        return min(max_seq_len, ((v + 47) // 48) * 48)

    b = len(samples)
    # One shared length bucket for both targets: the decoder row is the CTC
    # row +bos/eos, so splitting them only doubled the compiled-shape set.
    shared = _bucket(max(2, max((len(e) for e in enc_dec), default=2),
                         max((len(e) for e in enc_ctc), default=1)))
    lc = ld = shared
    ctc_target = np.zeros((b, lc), np.int32)
    ctc_len = np.zeros((b,), np.int32)
    dec_inp = np.zeros((b, ld - 1), np.int32)
    dec_tgt = np.zeros((b, ld - 1), np.int32)
    for i, (ec, ed) in enumerate(zip(enc_ctc, enc_dec)):
        ctc_target[i, : len(ec)] = ec
        ctc_len[i] = len(ec)
        if len(ed) < 2:
            ed = [tok.dec_bos, tok.dec_eos]
        if ed[-1] != tok.dec_eos:
            ed = ed[:-1] + [tok.dec_eos]
        dec_inp[i, : len(ed) - 1] = ed[:-1]
        dec_tgt[i, : len(ed) - 1] = ed[1:]
    return {"image": images, "ctc_target": ctc_target, "ctc_len": ctc_len,
            "dec_inp": dec_inp, "dec_tgt": dec_tgt}


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr
    pad = np.zeros((n - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def width_bucket_plan(rng: np.random.Generator, samples, cfg: CFG,
                      batch_size: int,
                      full_width_prob: float = 0.25) -> List[Tuple[List[int], int]]:
    """One epoch's batch plan: [(sample_indices, pad_width), ...], shuffled.

    Samples are grouped by the width bucket of their aspect-resized content
    (cfg.WIDTH_BUCKETS) so most batches pad only to their bucket — the same
    bucketing the inference engine uses, which keeps train and serve
    distributions aligned. Remainder chunks are filled by resampling within
    the group (keeps every batch shape in the compiled-program set). A
    ``full_width_prob`` fraction of batches pads to IMG_W regardless, so the
    model also sees the long-pad layout the single-line API produces.
    """
    from ..ops.preprocess import content_width, pick_width_bucket

    groups: Dict[int, List[int]] = {}
    for i, s in enumerate(samples):
        nw = content_width(np.asarray(s["image"]).shape, cfg.IMG_H, cfg.IMG_W)
        groups.setdefault(pick_width_bucket(cfg, nw), []).append(i)
    plan: List[Tuple[List[int], int]] = []
    for bw, idxs in groups.items():
        order = rng.permutation(len(idxs))
        for s0 in range(0, len(idxs), batch_size):
            chunk = [idxs[int(j)] for j in order[s0: s0 + batch_size]]
            if len(chunk) < batch_size:
                extra = rng.choice(idxs, size=batch_size - len(chunk),
                                   replace=len(idxs) < batch_size)
                chunk = chunk + [int(j) for j in extra]
            w = cfg.IMG_W if rng.random() < full_width_prob else bw
            plan.append((chunk, w))
    rng.shuffle(plan)
    return plan


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------
class Trainer:
    """End-to-end recognizer training orchestration."""

    def __init__(self, cfg: CFG, tok: CharTokenizer, tc: TrainConfig,
                 variables: Optional[Dict[str, Any]] = None,
                 total_steps: int = 10000, use_mesh: bool = True):
        from ..utils.cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        self.tok = tok
        self.tc = tc
        self.total_steps = total_steps

        if variables is None:
            variables = R.init_recognizer(
                jax.random.PRNGKey(tc.seed), cfg, tok)
        self.mesh = None
        if use_mesh:
            try:
                self.mesh = make_mesh(tc.n_devices, tc.model_parallel)
            except Exception:
                self.mesh = None
        if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1:
            variables = shard_variables(variables, self.mesh)
        self.variables = variables

        self.optimizer, self.schedule = make_optimizer(tc, total_steps)
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.train_step = make_train_step(cfg, tok, self.optimizer, tc, self.mesh)
        self.eval_step = make_eval_step(cfg)
        self.step = 0
        self.epoch = 0
        self.best_val_acc = 0.0
        self.last_ar_acc: Optional[float] = None
        self.history: List[Dict[str, float]] = []
        self._rng = jax.random.PRNGKey(tc.seed)
        self._engine = None  # lazy RecognizerEngine for AR validation

    # -------------------------------------------------------------- stepping
    def run_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        if self.mesh is not None and self.mesh.shape[DATA_AXIS] > 1:
            # Multi-process runs feed every process the same global batch;
            # shard_batch_global keeps only this process's rows (and is
            # plain shard_batch at process_count 1).
            batch, _ = pad_batch_to_devices(batch, self.mesh)
            batch = shard_batch_global(batch, self.mesh)
        self._rng, rng = jax.random.split(self._rng)
        lr = jnp.asarray(float(self.schedule(self.step)), jnp.float32)
        self.variables, self.opt_state, metrics = self.train_step(
            self.variables, self.opt_state, batch, rng, lr)
        self.step += 1
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------ validation
    def validate(self, val_batches: Iterable[Dict[str, Any]],
                 ar_sample_every: int = 10, verbose: bool = True) -> float:
        """Batched CTC exact-match accuracy plus sampled AR-decode accuracy
        with a CTC/decoder divergence warning (reference: training.py:865-949,
        warning at ~:934 when the AR head lags CTC by >15 points).

        AR decode runs on the first sample of every `ar_sample_every`-th
        batch (0 disables). Returns the CTC accuracy; the sampled AR
        accuracy lands in ``self.last_ar_acc``.
        """
        correct = total = 0
        ar_imgs: List[np.ndarray] = []
        ar_texts: List[str] = []
        for bi, batch in enumerate(val_batches):
            imgs = batch["image"]
            texts = batch["text"]
            ids = np.asarray(self.eval_step(self.variables, jnp.asarray(imgs)))
            preds = self.tok.decode_ctc_batch(ids)
            for p, t in zip(preds, texts):
                correct += int(p == t)
                total += 1
            # AR sample: the whole FIRST batch (a real sample — a 1-line
            # probe makes ar_acc a coin flip and poisons select_metric),
            # plus one line of every ar_sample_every-th later batch.
            if ar_sample_every and bi == 0:
                ar_imgs.append(np.asarray(imgs))
                ar_texts.extend(texts)
            elif ar_sample_every and bi % ar_sample_every == 0 and len(texts):
                ar_imgs.append(np.asarray(imgs[:1]))
                ar_texts.append(texts[0])
        acc = correct / max(1, total)

        self.last_ar_acc = None
        if ar_imgs:
            from ..engine import RecognizerEngine

            if self._engine is None:
                self._engine = RecognizerEngine(self.variables, self.cfg,
                                                self.tok)
            self._engine.variables = self.variables
            results = self._engine.recognize_batch(
                np.concatenate(ar_imgs, axis=0), "decoder")
            ar_correct = sum(int(hyp == ref) for (hyp, _), ref
                             in zip(results, ar_texts))
            self.last_ar_acc = ar_correct / len(ar_texts)
            warning = ar_divergence_warning(acc, self.last_ar_acc)
            if warning and verbose:
                print(warning)
        return acc

    # ----------------------------------------------------------- checkpoints
    def save(self, path, vocab_path: str = "") -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            # Multi-process: params are replicated (TP shards stay inside a
            # process), so process 0 alone writes the checkpoint.
            return
        save_checkpoint(path, jax.device_get(self.variables), self.cfg,
                        vocab_path=vocab_path, epoch=self.epoch,
                        step=self.step, best_val_acc=self.best_val_acc,
                        opt_state=jax.device_get(self.opt_state))

    def resume(self, path) -> bool:
        p = Path(path)
        if not p.exists():
            return False
        variables, cfg, meta = load_checkpoint(str(p), self.cfg)
        if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1:
            variables = shard_variables(variables, self.mesh)
        self.variables = variables
        self.epoch = int(meta.get("epoch", 0))
        self.step = int(meta.get("step", 0))
        self.best_val_acc = float(meta.get("best_val_acc", 0.0))
        restored = load_opt_state(str(p), self.opt_state)
        if restored is not None:
            self.opt_state = restored
        return True


# ---------------------------------------------------------------------------
# High-level loop (used by the CLI `train` subcommand)
# ---------------------------------------------------------------------------
def train_loop(cfg: CFG, tok: CharTokenizer, tc: TrainConfig,
               train_samples, val_samples, vocab_path: str = "",
               from_model: Optional[str] = None,
               verbose: bool = True, resume: bool = True) -> Trainer:
    """train_samples / val_samples: sequences of {image u8 [H,W], text}."""
    # The OneCycle horizon must match the real step count: width_bucket_plan
    # emits sum(ceil(group/B)) batches per epoch (remainders are resampled,
    # not dropped), which exceeds len(samples)//B by up to one batch per
    # width group. Build a throwaway plan to count batches exactly.
    steps_per_epoch = max(1, len(width_bucket_plan(
        np.random.default_rng(tc.seed), train_samples, cfg, tc.batch_size)))
    total_steps = steps_per_epoch * tc.epochs
    trainer = Trainer(cfg, tok, tc, total_steps=total_steps)

    out = Path(tc.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    latest = out / "latest.safetensors"
    if from_model and Path(from_model).exists():
        variables, _, _ = load_checkpoint(from_model, cfg)
        trainer.variables = variables
        if verbose:
            print(f"🔥 Warm start from {from_model}")
    if resume and trainer.resume(latest) and verbose:
        print(f"▶ Resumed from {latest} (epoch {trainer.epoch}, step {trainer.step})")

    rng = np.random.default_rng(tc.seed)
    n = len(train_samples)
    if verbose:
        print(f"📊 {n} train / {len(val_samples)} val samples; "
              f"{steps_per_epoch} steps/epoch x {tc.epochs} epochs")
        print(f"🧮 {R.num_params(trainer.variables) / 1e6:.1f}M params")

    # Pre-collate validation batches once.
    val_batches = []
    for i in range(0, len(val_samples), tc.batch_size):
        chunk = val_samples[i: i + tc.batch_size]
        vb = collate(chunk, tok, tc.max_seq_len, img_hw=(cfg.IMG_H, cfg.IMG_W))
        vb["text"] = [s["text"] for s in chunk]
        val_batches.append(vb)

    start_epoch = trainer.epoch
    for epoch in range(start_epoch, tc.epochs):
        trainer.epoch = epoch
        plan = width_bucket_plan(rng, train_samples, cfg, tc.batch_size)
        t0 = time.time()
        epoch_metrics: Dict[str, float] = {}
        n_steps = 0
        steps_per_epoch = len(plan)
        for bi, (idx, pad_w) in enumerate(plan):
            batch = collate([train_samples[int(i)] for i in idx], tok,
                            tc.max_seq_len, img_hw=(cfg.IMG_H, pad_w))
            m = trainer.run_step(batch)
            n_steps += 1
            for k, v in m.items():
                epoch_metrics[k] = epoch_metrics.get(k, 0.0) + v
            if verbose and tc.log_every and (bi + 1) % tc.log_every == 0:
                print(f"  e{epoch} s{bi + 1}/{steps_per_epoch} "
                      f"loss={m['loss']:.4f} ctc={m.get('ctc_loss', 0):.4f} "
                      f"dec={m.get('dec_loss', 0):.4f}")
            if tc.save_steps and trainer.step % tc.save_steps == 0:
                trainer.save(out / f"model_step_{trainer.step}.safetensors",
                             vocab_path)
                trainer.save(latest, vocab_path)

        avg = {k: v / max(1, n_steps) for k, v in epoch_metrics.items()}
        row = {"epoch": epoch, **avg, "time_s": time.time() - t0}
        if val_batches and (epoch + 1) % tc.val_every == 0:
            acc = trainer.validate(val_batches, verbose=verbose)
            row["val_ctc_acc"] = acc
            if trainer.last_ar_acc is not None:
                row["val_ar_acc"] = trainer.last_ar_acc
            # Selection metric: the product's DEFAULT decode is the AR head
            # ('accurate'), so AR-focused runs can select on it instead of
            # CTC exact-match (the round-2 accurate-mode CER gap came from
            # always selecting on the CTC head).
            ar = trainer.last_ar_acc
            score = {"ctc": acc,
                     "ar": ar if ar is not None else acc,
                     "mean": (acc + ar) / 2 if ar is not None else acc,
                     }[tc.select_metric]
            if score > trainer.best_val_acc:
                trainer.best_val_acc = score
                trainer.save(out / "model.safetensors", vocab_path)
        trainer.history.append(row)
        if verbose:
            msg = f"Epoch {epoch}: loss={avg.get('loss', 0):.4f}"
            if "val_ctc_acc" in row:
                msg += f" val_acc={row['val_ctc_acc'] * 100:.2f}%"
            if "val_ar_acc" in row:
                msg += f" ar_acc={row['val_ar_acc'] * 100:.2f}%"
            print(msg + f" ({row['time_s']:.1f}s)")

        trainer.epoch = epoch + 1
        trainer.save(out / f"model_epoch_{epoch + 1}.safetensors", vocab_path)
        trainer.save(latest, vocab_path)
        (out / "history.json").write_text(json.dumps(trainer.history, indent=2))
    return trainer
