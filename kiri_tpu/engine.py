"""RecognizerEngine: host-side orchestration of the jitted recognition programs.

This is the TPU replacement for the reference's per-region eager dispatch
(reference: kiri_ocr/core.py:530-575). All N detected lines of a page are
recognized in a handful of compiled calls:

    uint8 [N, H, W] -> pad to batch bucket -> encode + CTC (one program)
                    -> (fast path: done on host)
                    -> beam/greedy while_loop program bucketed by decode steps

Program cache: one compiled executable per (batch_bucket, step_bucket, mode);
with the default buckets that is a small, bounded set reused forever.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Generator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import CFG
from .models import recognizer as R
from .ops import decode as D
from .ops.ctc import greedy_ctc_stats
from .tokenizer import CharTokenizer


def pack4(imgs_u8: np.ndarray) -> np.ndarray:
    """uint8 [..., W] -> uint8 [..., W/2]: two 16-level pixels per byte.

    Quantizes to the 16 levels {0, 17, ..., 255} (nearest); W must be
    even (width buckets are multiples of 32)."""
    q = ((imgs_u8.astype(np.uint16) + 8) // 17).astype(np.uint8)
    return (q[..., 0::2] << 4) | q[..., 1::2]


def _unpack4(packed_u8):
    """Device-side inverse of pack4: uint8 [..., W/2] -> uint8 [..., W]."""
    hi = (packed_u8 >> 4) * jnp.uint8(17)
    lo = (packed_u8 & 0xF) * jnp.uint8(17)
    return jnp.stack([hi, lo], axis=-1).reshape(
        packed_u8.shape[:-1] + (packed_u8.shape[-1] * 2,))


class RecognizerEngine:
    def __init__(self, variables, cfg: CFG, tok: CharTokenizer, mesh=None,
                 upload_bits: int = 8):
        """``mesh``: optional jax.sharding.Mesh for multi-chip inference.
        Parameters are placed per the tensor-parallel specs (pure DP meshes
        degrade to replication) and input batches are sharded over the data
        axis — each chip encodes its slice, XLA inserts any TP collectives.
        The reference has no distributed inference (SURVEY §2.5).

        ``upload_bits=4``: pack two pixels per byte on the host (16 gray
        levels) and unpack fused on device — halves the recognition
        upload, the dominant wire cost of tunnel-fed serving. Measured on
        the flagship over 128 mixed-script lines: 127/128 identical
        texts, CER 0.0023 -> 0.0026, max confidence delta 0.003. Default
        8 keeps uploads bit-exact."""
        from .utils.cache import enable_persistent_cache

        enable_persistent_cache()
        if upload_bits not in (4, 8):
            raise ValueError(f"upload_bits must be 4 or 8, got {upload_bits}")
        self.mesh = mesh
        if mesh is not None:
            from .parallel import shard_variables

            variables = shard_variables(variables, mesh)
        self.variables = variables
        self.cfg = cfg
        self.tok = tok
        self.upload_bits = upload_bits
        self._encode_jit = jax.jit(partial(self._encode_impl, cfg=cfg))
        if upload_bits == 4:
            def _encode_packed(variables, packed_u8, *, cfg):
                return self._encode_impl(variables, _unpack4(packed_u8),
                                         cfg=cfg)

            self._encode_packed_jit = jax.jit(
                partial(_encode_packed, cfg=cfg))

    # ------------------------------------------------------------- internals
    def _encode_impl(self, variables, imgs_u8, *, cfg):
        mem, _ = R.encode(variables, imgs_u8, cfg, train=False)
        ctc = R.ctc_logits(variables["params"], mem, cfg) if cfg.USE_CTC else None
        memp = R.mem_project(variables["params"], mem)
        if ctc is not None:
            ids, conf, est = greedy_ctc_stats(ctc)
        else:
            n = imgs_u8.shape[0]
            ids = jnp.zeros((n, memp.shape[1]), jnp.int32)
            conf = jnp.zeros((n,))
            est = jnp.zeros((n,), jnp.int32)
        return mem, memp, ctc, ids, conf, est

    def _pad_batch(self, imgs: np.ndarray) -> Tuple[np.ndarray, int]:
        n = imgs.shape[0]
        bucket = D.pick_batch_bucket(self.cfg, n)
        if self.mesh is not None:
            from .parallel import DATA_AXIS

            dp = self.mesh.shape[DATA_AXIS]
            bucket = ((bucket + dp - 1) // dp) * dp
        if bucket > n:
            pad = np.zeros((bucket - n,) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, pad], axis=0)
        return imgs, n

    def _place(self, imgs):
        """Shard the batch dim over the mesh's data axis (no-op single-chip)."""
        if self.mesh is None:
            return imgs
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import DATA_AXIS

        return jax.device_put(
            imgs, NamedSharding(self.mesh, P(DATA_AXIS, None, None)))

    def encode_batch(self, imgs_u8: np.ndarray):
        """Returns (memp, ctc_logits, ctc_ids, ctc_conf, est_len, n_valid)."""
        padded, n = self._pad_batch(np.asarray(imgs_u8))
        if self.upload_bits == 4:
            mem, memp, ctc, ids, conf, est = self._encode_packed_jit(
                self.variables, self._place(pack4(padded)))
        else:
            mem, memp, ctc, ids, conf, est = self._encode_jit(
                self.variables, self._place(padded))
        return memp, ctc, ids, conf, est, n

    def _decode_texts(self, out: D.DecodeOut, n: int
                      ) -> Tuple[List[str], np.ndarray, np.ndarray,
                                 Optional[np.ndarray]]:
        # One transfer for all result fields (separate np.asarray calls
        # each pay a full round-trip on a remote backend). ``converged`` is
        # fetched in the same transfer when the decode can report it
        # (spec_decode past its round budget).
        conv = None
        if out.converged is None:
            tokens, lengths, final_conf, dec_conf = jax.device_get(
                (out.tokens, out.lengths, out.final_conf, out.dec_conf))
        else:
            tokens, lengths, final_conf, dec_conf, conv = jax.device_get(
                (out.tokens, out.lengths, out.final_conf, out.dec_conf,
                 out.converged))
            conv = conv[:n]
        tokens = tokens[:n]
        lengths = lengths[:n]
        # Text = tokens[1:length], stop at eos (reference: model.py:584-590).
        texts = []
        for i in range(n):
            ids = tokens[i, 1:lengths[i]]
            eos_pos = np.nonzero(ids == self.tok.dec_eos)[0]
            if eos_pos.size:
                ids = ids[: eos_pos[0]]
            texts.append(self.tok.decode_dec(ids))
        return texts, final_conf[:n], dec_conf[:n], conv

    def _step_cap(self, est_len: np.ndarray, n: int, mem_len: int) -> int:
        tl = np.asarray(est_len)[:n]
        ms = np.where(
            tl > 0,
            np.minimum(self.cfg.MAX_DEC_LEN,
                       (tl * self.cfg.DEC_MAX_LEN_RATIO).astype(np.int64)
                       + self.cfg.DEC_MAX_LEN_PAD),
            min(self.cfg.MAX_DEC_LEN, int(mem_len * self.cfg.MEM_MAX_LEN_RATIO)
                + self.cfg.DEC_MAX_LEN_PAD))
        return D.pick_l_cap(self.cfg, int(ms.max(initial=1)))

    # ---------------------------------------------------------- public paths
    def recognize_crops(self, crops: Sequence[np.ndarray], method: str,
                        enhance: bool = False, sharpen: bool = False
                        ) -> List[Tuple[str, float]]:
        """Recognize raw variable-size line crops with DEVICE preprocessing:
        the Pallas kernel (kernels/resize.py) fuses invert-if-dark + aspect
        resize + pad + normalize on-chip, then recognition proceeds as usual.

        Host-side preprocessing (``recognize_batch``) ships fewer bytes per
        line (48x640 u8 vs padded raw crops), so it wins when host->device
        bandwidth is the bottleneck; this path wins when host CPU is.

        ``enhance``/``sharpen`` run the on-device adaptive crop cleanup
        (kernels/resize.enhance_lines) before the fused preprocess — the
        device twin of the host path's ``enhance_crop``. ``sharpen`` is a
        bool or a per-crop bool sequence (deskew provenance per page).
        """
        if len(crops) == 0:
            return []
        import jax.numpy as jnp

        from .kernels.resize import (enhance_lines, pack_crops,
                                     post_blur_masked, preprocess_lines)

        buf, sizes = pack_crops(list(crops))
        mask = np.broadcast_to(np.asarray(sharpen, bool),
                               (buf.shape[0],)).copy()
        bucket = D.pick_batch_bucket(self.cfg, buf.shape[0])
        if bucket > buf.shape[0]:
            pad_n = bucket - buf.shape[0]
            buf = np.concatenate(
                [buf, np.zeros((pad_n,) + buf.shape[1:], np.uint8)])
            sizes = np.concatenate(
                [sizes, np.ones((pad_n, 2), np.int32)], axis=0)
            mask = np.concatenate([mask, np.zeros((pad_n,), bool)])
        dbuf, dsizes = jnp.asarray(buf), jnp.asarray(sizes)
        small_noisy = None
        if enhance:
            dbuf, small_noisy = enhance_lines(dbuf, dsizes,
                                              sharpen=jnp.asarray(mask))
        norm = preprocess_lines(dbuf, dsizes, self.cfg.IMG_H, self.cfg.IMG_W,
                                linear_mask=small_noisy)
        if small_noisy is not None:
            # Small noisy crops: linear-upscaled above, denoised here at
            # model scale (the host path's upscale-then-blur policy).
            norm = post_blur_masked(norm, small_noisy)
        return self._recognize_prepared(norm, len(crops), method)

    def _recognize_prepared(self, imgs, n: int, method: str
                            ) -> List[Tuple[str, float]]:
        mem, memp, ctc, ids, conf, est = self._encode_jit(self.variables, imgs)
        return self._finish(memp, ctc, ids, conf, est, n, method)

    def recognize_batch(self, imgs_u8: np.ndarray, method: str,
                        widths: Optional[np.ndarray] = None
                        ) -> List[Tuple[str, float]]:
        """Recognize N line images. method in {"ctc", "decoder", "beam",
        "auto"} — "auto" returns greedy-CTC results for rows whose CTC
        confidence clears cfg.AUTO_CONF_THRESHOLD and beam-search results
        for the rest (escalated on device from the shared encode).

        With ``widths`` (per-row content widths from preprocess_regions) the
        batch is split into width buckets (cfg.WIDTH_BUCKETS) and each group
        runs a program sliced to its bucket — encoder FLOPs and decode memory
        scale with width, so a page of mostly-short lines costs a fraction of
        all-full-width dispatches. Results come back in input order.
        """
        imgs_u8 = np.asarray(imgs_u8)
        if imgs_u8.shape[0] == 0:
            return []
        if widths is None:
            memp, ctc, ids, conf, est, n = self.encode_batch(imgs_u8)
            return self._finish(memp, ctc, ids, conf, est, n, method)

        from .ops.preprocess import pick_width_bucket

        n = imgs_u8.shape[0]
        groups: Dict[int, List[int]] = {}
        for i in range(n):
            groups.setdefault(
                pick_width_bucket(self.cfg, int(widths[i])), []).append(i)
        out: List[Optional[Tuple[str, float]]] = [None] * n
        # Enqueue every chunk's encode before finishing any: dispatch is
        # async, so chunk k+1's upload + device compute overlap the
        # host-side CTC decode / beam launch for chunk k instead of
        # serializing on it. Groups larger than the biggest batch bucket
        # are split into max-bucket chunks rather than padded up to a new
        # program shape — the compiled-program set stays bounded at
        # len(BATCH_BUCKETS) x len(WIDTH_BUCKETS) and oversize groups
        # reuse the already-hot max-bucket executable.
        max_b = int(self.cfg.BATCH_BUCKETS[-1])
        pending = []
        for bw, idxs in sorted(groups.items()):
            for s in range(0, len(idxs), max_b):
                chunk = idxs[s: s + max_b]
                sub = np.ascontiguousarray(imgs_u8[np.asarray(chunk), :, :bw])
                pending.append((chunk, self.encode_batch(sub)))
        if method == "ctc":
            # ONE transfer for every chunk's results: each synchronous
            # fetch costs a full ~40ms round-trip on a tunneled backend,
            # so N chunks fetched separately would serialize N round-trips
            # even though their compute overlapped.
            fetched = jax.device_get(
                [(ids, conf) for _, (_, _, ids, conf, _, _) in pending])
            for (idxs, (_, _, _, _, _, m)), (ids_np, conf_np) in zip(
                    pending, fetched):
                texts = self.tok.decode_ctc_batch(ids_np[:m])
                for i, t, c in zip(idxs, texts, conf_np[:m]):
                    out[i] = (t, float(c))
            return out  # type: ignore[return-value]
        if method == "auto":
            # CTC results for everything (one fused fetch), then beam
            # escalation launched per chunk on the low-confidence subset —
            # all launches enqueued before the single result fetch.
            fetched = jax.device_get(
                [(ids, conf, est)
                 for _, (_, _, ids, conf, est, _) in pending])
            launched = []
            for (idxs, (memp, ctc, ids, conf, est, m)), \
                    (ids_np, conf_np, est_np) in zip(pending, fetched):
                texts = self.tok.decode_ctc_batch(ids_np[:m])
                for i, t, c in zip(idxs, texts, conf_np[:m]):
                    out[i] = (t, float(c))
                esc = self._launch_escalation(memp, ctc, conf_np[:m],
                                              est_np[:m], m)
                if esc is not None:
                    low, dec = esc
                    launched.append(([idxs[r] for r in low], len(low), dec))
            fetched2 = jax.device_get(
                [(d.tokens, d.lengths, d.final_conf)
                 for _, _, d in launched])
            for (idxs, m, _), (tokens, lengths, final_conf) in zip(
                    launched, fetched2):
                for row, i in enumerate(idxs):
                    tok_ids = tokens[row, 1: lengths[row]]
                    eos_pos = np.nonzero(tok_ids == self.tok.dec_eos)[0]
                    if eos_pos.size:
                        tok_ids = tok_ids[: eos_pos[0]]
                    out[i] = (self.tok.decode_dec(tok_ids),
                              float(final_conf[row]))
            return out  # type: ignore[return-value]
        # Beam/greedy: pipeline the chunks like the CTC path. One fused
        # fetch of every chunk's length estimates, then ALL decode
        # while_loops enqueued back-to-back, then one fused result fetch —
        # per-chunk _finish would serialize (est fetch + launch + result
        # fetch) x chunks round-trips over the link.
        k = 1 if method == "decoder" else self.cfg.BEAM
        ests = jax.device_get([est for _, (_, _, _, _, est, _) in pending])
        launched = []
        for (idxs, (memp, ctc, ids, conf, est, m)), est_np in zip(pending,
                                                                  ests):
            l_cap = self._step_cap(est_np, m, memp.shape[1])
            tl_np = np.where(est_np > 0, est_np, 0).astype(np.int32)
            tl = jnp.asarray(tl_np)
            if k == 1:
                dec = self._launch_single_hyp(memp, ctc, ids, tl, conf, l_cap)
            else:
                dec = D.beam_search(
                    self.variables, memp, ctc, tl, conf, cfg=self.cfg,
                    k_beam=k, l_cap=l_cap, eos_id=self.tok.dec_eos,
                    unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
                    dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos)
            launched.append((idxs, m, dec, memp, ctc, conf, tl_np, l_cap))
        fetched = jax.device_get(
            [(d.tokens, d.lengths, d.final_conf)
             + (() if d.converged is None else (d.converged,))
             for _, _, d, *_ in launched])
        for (idxs, m, _, memp, ctc, conf, tl_np, l_cap), f in zip(launched,
                                                                  fetched):
            tokens, lengths, final_conf = f[0], f[1], f[2]
            for row, i in enumerate(idxs):
                tok_ids = tokens[row, 1: lengths[row]]
                eos_pos = np.nonzero(tok_ids == self.tok.dec_eos)[0]
                if eos_pos.size:
                    tok_ids = tok_ids[: eos_pos[0]]
                out[i] = (self.tok.decode_dec(tok_ids),
                          float(final_conf[row]))
            conv = f[3][:m] if len(f) > 3 else None
            if conv is not None and not conv.all():
                # spec_decode round budget hit (garbage drafts): step-loop
                # re-decode for just those rows, on-device gather.
                rows = [r for r in range(m) if not conv[r]]
                fb = self._step_redecode(memp, ctc, tl_np, conf, rows, l_cap)
                fb_texts, fb_conf, _, _ = self._decode_texts(fb, len(rows))
                for r, row in enumerate(rows):
                    out[idxs[row]] = (fb_texts[r], float(fb_conf[r]))
        return out  # type: ignore[return-value]

    def _launch_escalation(self, memp, ctc, conf_np, est_np, m: int):
        """decode_method="auto" support: pick the rows of an encoded chunk
        whose greedy-CTC confidence is below cfg.AUTO_CONF_THRESHOLD and
        launch beam search on just those rows, gathered ON DEVICE from the
        already-computed encoder outputs (no re-encode, no re-upload).
        Returns (low_row_indices, DecodeOut) or None if every row is
        confident. The fetch is the caller's job so launches can pipeline.
        """
        low = [r for r in range(m)
               if conf_np[r] < self.cfg.AUTO_CONF_THRESHOLD]
        if not low:
            return None
        sel = np.asarray(low, np.int32)
        b2 = D.pick_batch_bucket(self.cfg, len(low))
        sel_pad = np.concatenate(
            [sel, np.zeros(b2 - len(low), np.int32)])
        sel_dev = jnp.asarray(sel_pad)
        memp2 = jnp.take(memp, sel_dev, axis=0)
        ctc2 = jnp.take(ctc, sel_dev, axis=0) if ctc is not None else None
        est_sel = np.asarray(est_np)[sel]
        l_cap = self._step_cap(est_sel, len(low), memp.shape[1])
        tl = jnp.asarray(np.concatenate(
            [np.where(est_sel > 0, est_sel, 0),
             np.zeros(b2 - len(low), est_sel.dtype)]), jnp.int32)
        conf2 = jnp.asarray(np.concatenate(
            [np.asarray(conf_np)[sel],
             np.zeros(b2 - len(low), np.asarray(conf_np).dtype)]))
        dec = D.beam_search(
            self.variables, memp2, ctc2, tl, conf2, cfg=self.cfg,
            k_beam=self.cfg.BEAM, l_cap=l_cap, eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos)
        return low, dec

    def _finish(self, memp, ctc, ids, conf, est, n: int, method: str
                ) -> List[Tuple[str, float]]:
        if method == "ctc":
            # One transfer call for both arrays (two np.asarray calls pay
            # two serial round-trips on a remote backend).
            ids_np, conf_np = jax.device_get((ids, conf))
            texts = self.tok.decode_ctc_batch(ids_np[:n])
            return list(zip(texts, conf_np[:n].astype(float)))

        if method == "auto":
            ids_np, conf_np, est_np = jax.device_get((ids, conf, est))
            texts = self.tok.decode_ctc_batch(ids_np[:n])
            results = list(zip(texts, conf_np[:n].astype(float)))
            esc = self._launch_escalation(memp, ctc, conf_np[:n],
                                          est_np[:n], n)
            if esc is None:
                return results
            low, dec = esc
            beam_texts, beam_conf, _, _ = self._decode_texts(dec, len(low))
            for r, i in enumerate(low):
                results[i] = (beam_texts[r], float(beam_conf[r]))
            return results

        k = 1 if method == "decoder" else self.cfg.BEAM
        l_cap = self._step_cap(est, n, memp.shape[1])
        est_np = np.asarray(est)
        tl_np = np.where(est_np > 0, est_np, 0).astype(np.int32)
        tl = jnp.asarray(tl_np)
        if (k > 1 and self.cfg.SPEC_BEAM and ctc is not None
                and ids is not None):
            # Certificate-gated speculative beam: text-identical to the
            # step-loop beam on every line (beam_spec_certificate), at
            # spec-decode cost on the certified majority.
            results = [("", 0.0)] * n
            for sel, dec in self.beam_device_spec(memp, ctc, ids, est_np,
                                                  conf):
                texts, fconf, _, _ = self._decode_texts(dec, len(sel))
                for r, i in enumerate(sel):
                    results[int(i)] = (texts[r], float(fconf[r]))
            return results
        out = self._launch_single_hyp(memp, ctc, ids, tl, conf, l_cap) \
            if k == 1 else D.beam_search(
            self.variables, memp, ctc, tl, conf, cfg=self.cfg, k_beam=k,
            l_cap=l_cap, eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos)
        texts, final_conf, _, conv = self._decode_texts(out, n)
        results = list(zip(texts, final_conf.astype(float)))
        if conv is not None and not conv.all():
            rows = [i for i in range(n) if not conv[i]]
            fb = self._step_redecode(memp, ctc, tl_np, conf, rows, l_cap)
            fb_texts, fb_conf, _, _ = self._decode_texts(fb, len(rows))
            for r, i in enumerate(rows):
                results[i] = (fb_texts[r], float(fb_conf[r]))
        return results

    def _launch_single_hyp(self, memp, ctc, ids, tl, conf, l_cap: int,
                           raw_select: bool = False) -> D.DecodeOut:
        """Single-hypothesis AR decode ("decoder"/accurate mode, k=1).

        With cfg.SPEC_DECODE the CTC transcript drafts the output and
        teacher-forced passes verify it (~2 dispatches per line instead of
        one per character, same output — ops/decode.spec_decode); otherwise
        the KV-cached step loop runs (beam_search k=1 / greedy_decode).
        """
        if self.cfg.SPEC_DECODE and ctc is not None and ids is not None:
            rescore = (not raw_select) and self.cfg.ACCURATE_CTC_RESCORE
            return D.spec_decode(
                self.variables, memp, ids, tl,
                None if raw_select else conf, cfg=self.cfg, l_cap=l_cap,
                eos_id=self.tok.dec_eos,
                unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
                dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos,
                raw_select=raw_select, max_rounds=self.cfg.SPEC_MAX_ROUNDS,
                ctc_logits=ctc if rescore else None)
        if raw_select:
            return D.greedy_decode(
                self.variables, memp, tl, cfg=self.cfg, l_cap=l_cap,
                eos_id=self.tok.dec_eos,
                unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
                bos_id=self.tok.dec_bos)
        return D.beam_search(
            self.variables, memp, ctc, tl, conf, cfg=self.cfg, k_beam=1,
            l_cap=l_cap, eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos)

    def _step_redecode(self, memp, ctc, tl_np: np.ndarray, conf,
                       rows: List[int], l_cap: int,
                       raw_select: bool = False) -> D.DecodeOut:
        """Re-decode the given rows with the sequential step loop — the
        spec_decode fallback for rows past the round budget (garbage drafts).
        Rows are gathered ON DEVICE from the chunk's encoder outputs (no
        re-encode/re-upload), padded to a batch bucket."""
        sel = np.asarray(rows, np.int32)
        b2 = D.pick_batch_bucket(self.cfg, len(rows))
        sel_dev = jnp.asarray(np.concatenate(
            [sel, np.zeros(b2 - len(rows), np.int32)]))
        memp2 = jnp.take(memp, sel_dev, axis=0)
        tl2 = jnp.asarray(np.concatenate(
            [tl_np[sel], np.zeros(b2 - len(rows), tl_np.dtype)]), jnp.int32)
        if raw_select:
            return D.greedy_decode(
                self.variables, memp2, tl2, cfg=self.cfg, l_cap=l_cap,
                eos_id=self.tok.dec_eos,
                unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
                bos_id=self.tok.dec_bos)
        ctc2 = jnp.take(ctc, sel_dev, axis=0) if ctc is not None else None
        conf2 = jnp.take(conf, sel_dev, axis=0)
        return D.beam_search(
            self.variables, memp2, ctc2, tl2, conf2, cfg=self.cfg, k_beam=1,
            l_cap=l_cap, eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos)

    def beam_device_bucketed(self, memp, ctc, est_np: np.ndarray, conf,
                             chunk: Optional[int] = None
                             ) -> List[Tuple[np.ndarray, D.DecodeOut]]:
        """Device-resident beam over per-row step-bucketed sub-batches.

        Rows in ``beam_search`` never interact, so splitting a batch by each
        row's step budget into separate (batch-bucket, l_cap) programs is
        text-identical to one max-l_cap program — but short rows then run a
        loop with half the iterations AND half the KV-cache bytes per step
        (cache traffic scales with l_buf). All dispatches are enqueued
        before returning; the caller fetches.

        est_np: host [N] CTC length estimates (0 = none). Returns
        [(row_indices, DecodeOut)] covering all rows exactly once.
        """
        n = memp.shape[0]
        tl_np = np.where(est_np[:n] > 0, est_np[:n], 0).astype(np.int32)
        # Per-row step budget with the same float32 semantics as the device
        # max_decode_steps (a float64 host product could round differently
        # right at a bucket boundary and clamp a row one step short).
        with_tl = np.minimum(
            self.cfg.MAX_DEC_LEN,
            (tl_np.astype(np.float32)
             * np.float32(self.cfg.DEC_MAX_LEN_RATIO)).astype(np.int32)
            + self.cfg.DEC_MAX_LEN_PAD)
        without = min(self.cfg.MAX_DEC_LEN,
                      int(memp.shape[1] * self.cfg.MEM_MAX_LEN_RATIO)
                      + self.cfg.DEC_MAX_LEN_PAD)
        ms = np.where(tl_np > 0, with_tl, without)
        # Sort rows by budget and cut into fixed bucket-sized chunks (not
        # into per-l_cap groups: a 68-row group would pad up to the 128
        # batch bucket and burn more than the split saves). Each chunk's
        # l_cap covers its longest row, so most chunks of a mixed batch run
        # the short program and the tail chunk runs the long one.
        order = np.argsort(ms, kind="stable").astype(np.int32)
        if chunk is None:
            chunk = max(1, min(getattr(self.cfg, "BEAM_CHUNK", 64),
                               D.pick_batch_bucket(self.cfg, n)))
        launched = []
        beam_buckets = getattr(self.cfg, "BEAM_STEP_BUCKETS", None)
        for s in range(0, n, chunk):
            sel = order[s: s + chunk]
            l_cap = D.pick_l_cap(self.cfg, int(ms[sel].max(initial=1)),
                                 buckets=beam_buckets)
            b2 = D.pick_batch_bucket(self.cfg, len(sel))
            # Pad with the chunk's own smallest-budget row (sel is
            # budget-sorted, so sel[0]): padding with absolute row 0 would
            # keep the while_loop alive up to THAT row's budget — possibly
            # the batch's largest — after every real row finished.
            sel_pad = np.concatenate(
                [sel, np.full(b2 - len(sel), sel[0], np.int32)])
            sel_dev = jnp.asarray(sel_pad)
            dec = D.beam_search(
                self.variables, jnp.take(memp, sel_dev, axis=0),
                jnp.take(ctc, sel_dev, axis=0) if ctc is not None else None,
                jnp.asarray(tl_np[sel_pad]), jnp.take(conf, sel_dev, axis=0),
                cfg=self.cfg, k_beam=self.cfg.BEAM, l_cap=l_cap,
                eos_id=self.tok.dec_eos,
                unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
                dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos,
                opt_unroll=getattr(self.cfg, "BEAM_UNROLL", 1))
            launched.append((sel, dec))
        return launched

    def beam_device_spec(self, memp, ctc, ids, est_np: np.ndarray, conf,
                         chunk: Optional[int] = None
                         ) -> List[Tuple[np.ndarray, D.DecodeOut]]:
        """Certificate-gated speculative beam over a device-resident batch.

        Runs the CTC-drafted single-hypothesis decode (2-3 parallel passes)
        plus one teacher-forced certificate pass proving, per line, that
        ``beam_search`` would return the identical text
        (ops/decode.beam_spec_certificate — score upper bounds on every
        possible beam branch). Only uncertified lines pay for the real
        step-loop beam (beam_device_bucketed). Output text is
        beam-identical on every line; confidences on certified lines can
        differ from the step loop in the last float ulps (same caveat as
        the shipping spec accurate mode).

        Same contract as beam_device_bucketed: returns
        [(row_indices, DecodeOut)] covering all rows exactly once, all
        dispatches enqueued before returning.
        """
        n = memp.shape[0]
        if ids is None or ctc is None:
            return self.beam_device_bucketed(memp, ctc, est_np, conf,
                                             chunk=chunk)
        tl_np = np.where(est_np[:n] > 0, est_np[:n], 0).astype(np.int32)
        tl = jnp.asarray(tl_np)
        l_cap = self._step_cap(est_np, n, memp.shape[1])
        spec = D.spec_decode(
            self.variables, memp, ids, tl, conf, cfg=self.cfg, l_cap=l_cap,
            eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos,
            raw_select=False, max_rounds=self.cfg.SPEC_MAX_ROUNDS,
            ctc_logits=None)
        cert = D.beam_spec_certificate(
            self.variables, memp, ctc, tl, spec.tokens, spec.lengths,
            cfg=self.cfg, k_beam=self.cfg.BEAM, l_cap=l_cap,
            eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset)
        cert_np, conv = jax.device_get(
            (cert, spec.converged if spec.converged is not None
             else jnp.ones((n,), bool)))
        ok = cert_np[:n] & conv[:n]
        launched: List[Tuple[np.ndarray, D.DecodeOut]] = []
        good = np.nonzero(ok)[0].astype(np.int32)
        if len(good):
            if len(good) == n:
                spec_good = spec
            else:
                gd = jnp.asarray(good)
                spec_good = D.DecodeOut(*[
                    jnp.take(f, gd, axis=0) if f is not None else None
                    for f in spec])
            launched.append((good, spec_good))
        bad = np.nonzero(~ok)[0].astype(np.int32)
        if len(bad):
            memp_b = jnp.take(memp, jnp.asarray(bad), axis=0)
            ctc_b = jnp.take(ctc, jnp.asarray(bad), axis=0)
            conf_b = jnp.take(conf, jnp.asarray(bad), axis=0)
            for sel, dec in self.beam_device_bucketed(
                    memp_b, ctc_b, est_np[:n][bad], conf_b, chunk=chunk):
                launched.append((bad[sel], dec))
        return launched

    # ------------------------------------------------------------- streaming
    def stream_records(self, img_u8: np.ndarray, method: str,
                       window: Optional[int] = None
                       ) -> Generator[Dict, None, None]:
        """Streaming chunk dicts for ONE line image; schema matches the
        reference streaming decoders exactly (kiri_ocr/model.py:689-1153)."""
        imgs = np.asarray(img_u8)[None] if img_u8.ndim == 2 else np.asarray(img_u8)
        yield from self.stream_records_batch(imgs, method, window=window)[0]

    def stream_records_batch(self, imgs_u8: np.ndarray, method: str,
                             window: Optional[int] = None
                             ) -> List[Sequence[Dict]]:
        """Streaming records for N lines, one record sequence per line.

        window=None: the whole page decodes in ONE compiled while_loop with
        per-step history recorded on device, then chunks replay here — the
        throughput mode (driver config #5); time-to-first-char is the full
        decode.

        window=W (int > 0): INCREMENTAL streaming for the AR methods. The
        decode runs in resumable W-step windows (decode state and KV cache
        stay on device between dispatches, ops/decode.*_stream_window) and
        each returned sequence is a lazy generator that emits a window's
        chunks as soon as that window's history lands on the host — matching
        the reference's yield-inside-the-loop behavior
        (kiri_ocr/model.py:779-946): time-to-first-char is encode + ONE
        window, not the page decode. Chunk content is bit-identical to
        window=None (the step math is shared). CTC streaming is already a
        single encode dispatch; it ignores ``window``.
        """
        imgs_u8 = np.asarray(imgs_u8)
        if imgs_u8.shape[0] == 0:
            return []
        if method == "auto":
            # Streaming emits tokens as they decode; auto's after-the-fact
            # beam escalation cannot retract streamed chars, so the stream
            # uses the CTC path (batch entry points get the escalation).
            method = "ctc"
        memp, ctc, ids, conf, est, n = self.encode_batch(imgs_u8)

        if method == "ctc":
            # One device softmax + ONE download for the whole page (each
            # synchronous fetch costs a full round-trip; per-row fetches
            # would dominate streaming latency).
            max_probs_dev = jnp.max(jax.nn.softmax(ctc, axis=-1), axis=-1)
            ids_np, max_probs = jax.device_get((ids, max_probs_dev))
            return [list(self._stream_ctc_row(ids_np[i], max_probs[i]))
                    for i in range(n)]

        l_cap = self._step_cap(est, n, memp.shape[1])
        tl_np = np.asarray(est).astype(np.int32)
        tl = jnp.asarray(tl_np)
        if window is not None and window > 0:
            runner = _WindowedStream(self, memp, tl, n, method, l_cap,
                                     int(window))
            return [runner.row_records(i) for i in range(n)]
        if method == "decoder":
            out = self._launch_single_hyp(memp, ctc, ids, tl, conf, l_cap,
                                          raw_select=True)
            out = jax.device_get(out)  # ONE fused fetch for all rows
            recs = [list(self._stream_greedy(out, i)) for i in range(n)]
            conv = out.converged
            if conv is not None and not conv[:n].all():
                rows = [i for i in range(n) if not conv[i]]
                fb = jax.device_get(self._step_redecode(
                    memp, ctc, tl_np, conf, rows, l_cap, raw_select=True))
                for r, i in enumerate(rows):
                    recs[i] = list(self._stream_greedy(fb, r))
            return recs
        out = D.beam_search(
            self.variables, memp, ctc, tl, conf, cfg=self.cfg,
            k_beam=self.cfg.BEAM, l_cap=l_cap, record_history=True,
            eos_id=self.tok.dec_eos,
            unk_dec_id=self.tok.unk_id + self.tok.dec_offset,
            dec_offset=self.tok.dec_offset, bos_id=self.tok.dec_bos)
        # The [N, S, L_buf] best-beam history dominates the result payload
        # (134MB at N=128, S=512 in int32). Downcast token ids to uint16 on
        # device (vocabularies are far below 65k) and fetch EVERYTHING in
        # one device_get — per-row np.asarray would re-download the full
        # buffer once per region.
        if self.tok.dec_vocab < 65535:
            out = out._replace(
                tokens=out.tokens.astype(jnp.uint16),
                hist_tokens=out.hist_tokens.astype(jnp.uint16))
        out = jax.device_get(out)
        return [list(self._stream_beam(out, i)) for i in range(n)]

    def _stream_ctc_row(self, best_ids: np.ndarray, max_probs: np.ndarray
                        ) -> Generator[Dict, None, None]:
        decoded = ""
        prev = None
        step = 0
        # Visual-order checkpoints emit ink-order tokens; the stream holds
        # back an open Khmer cluster and releases its logical characters
        # once it closes (token may be "" or several chars — the text field
        # is always a stable logical prefix). Identity on English.
        filt = self._stream_filter()
        for t in range(len(best_ids)):
            idx = int(best_ids[t])
            if idx == prev:
                continue
            prev = idx
            if idx < self.tok.ctc_offset:
                continue
            raw = idx - self.tok.ctc_offset
            if 0 <= raw < self.tok.vocab_size:
                char = self.tok.id_to_token.get(raw, "")
                if char and char != self.tok.unk_token:
                    emit = filt.push(char) if filt is not None else char
                    decoded += emit
                    step += 1
                    yield {"token": emit, "token_id": idx, "text": decoded,
                           "confidence": float(max_probs[t]), "step": step,
                           "finished": False}
        tail = filt.flush() if filt is not None else ""
        decoded += tail
        yield {"token": tail, "token_id": -1, "text": decoded,
               "confidence": float(max_probs.mean()), "step": step,
               "finished": True}

    def _stream_filter(self):
        """IncrementalLogical for visual-order checkpoints, else None."""
        if not self.tok.visual_order:
            return None
        from .data.khmer_order import IncrementalLogical

        return IncrementalLogical()

    def _stream_greedy(self, out: D.DecodeOut,
                       row: int = 0) -> Generator[Dict, None, None]:
        """Greedy AR streaming (reference: model.py:779-946)."""
        steps = int(np.asarray(out.hist_steps)[row])
        extra = np.asarray(out.hist_extra)[row]  # [S, 2] = (raw prob, token id)
        text = ""
        filt = self._stream_filter()
        prob = 0.0
        for s in range(steps):
            prob, tid = float(extra[s, 0]), int(extra[s, 1])
            finished = tid == self.tok.dec_eos
            char = ""
            if not finished and tid not in (self.tok.dec_pad, self.tok.dec_bos,
                                            self.tok.dec_eos):
                raw = tid - self.tok.dec_offset
                if 0 <= raw < self.tok.vocab_size:
                    # Reference quirk (model.py:925-930): an <unk> step
                    # yields token='<unk>' but does NOT grow the text.
                    char = self.tok.id_to_token.get(raw, "")
                    if char != self.tok.unk_token and filt is not None:
                        char = filt.push(char)  # logical diff, may be ""
                    if char != self.tok.unk_token:
                        text += char
            if finished and filt is not None:
                tail = filt.flush()
                char, text = char + tail, text + tail
            yield {"token": char, "token_id": tid, "text": text,
                   "confidence": prob, "step": s + 1, "finished": finished}
            if finished:
                break
        else:
            # Step budget exhausted without EOS: release any held-back
            # cluster so the streamed text is complete (visual mode only —
            # tail is always "" otherwise and no extra record is emitted).
            tail = filt.flush() if filt is not None else ""
            if tail:
                text += tail
                yield {"token": tail, "token_id": -1, "text": text,
                       "confidence": prob, "step": steps + 1,
                       "finished": False}

    def _stream_beam(self, out: D.DecodeOut,
                     row: int = 0) -> Generator[Dict, None, None]:
        """Beam streaming: best-hypothesis diff per step (model.py:949-1153)."""
        steps = int(np.asarray(out.hist_steps)[row])
        toks = np.asarray(out.hist_tokens)[row]
        lens = np.asarray(out.hist_len)[row]
        scores = np.asarray(out.hist_score)[row]
        fins = np.asarray(out.hist_finished)[row]
        prev_text = ""
        for s in range(steps):
            ids = toks[s, 1:lens[s]]
            eos_pos = np.nonzero(ids == self.tok.dec_eos)[0]
            if eos_pos.size:
                ids = ids[: eos_pos[0]]
            text = self.tok.decode_dec(ids)
            token = text[len(prev_text):] if len(text) > len(prev_text) else ""
            L = max(1, int(lens[s]) - 1)
            confidence = float(min(1.0, max(0.0, np.exp(scores[s] / L)))) if L > 0 else 0.0
            finished = bool(fins[s])
            yield {"token": token, "text": text, "confidence": confidence,
                   "step": s + 1, "finished": finished}
            prev_text = text
            if finished:
                break


class _WindowedStream:
    """Shared driver behind the incremental streaming generators.

    Holds the on-device resumable decode state (ops/decode.BeamStreamState /
    GreedyStreamState — tokens, scores, KV cache all stay device-resident
    between dispatches) plus per-row host record buffers. ``advance()`` runs
    ONE decode window for every row and converts its history into chunk
    dicts; ``row_records(i)`` is a lazy generator that drives ``advance``
    only when row i runs out of buffered records — so consuming rows in
    reading order (pipeline._stream_chars_batched) gets region 1's first
    chars after a single window, while later regions' records accumulate
    for free and replay instantly.

    Record content is bit-identical to the one-shot replay
    (RecognizerEngine._stream_greedy/_stream_beam): the per-step math is
    the same _beam_step/_greedy_step, and the conversion logic below
    mirrors those methods line for line, just segmented at window
    boundaries.
    """

    def __init__(self, engine: RecognizerEngine, memp, tl, n: int,
                 method: str, l_cap: int, window: int):
        self.e = engine
        self.n = n
        self.method = method
        self.window = window
        self.tl = tl
        cfg, tok = engine.cfg, engine.tok
        if method == "beam":
            self.state, self.cross = D.beam_stream_init(
                engine.variables, memp, tl, cfg=cfg, k_beam=cfg.BEAM,
                l_cap=l_cap, bos_id=tok.dec_bos)
        else:  # "decoder" — greedy streaming (raw-logits argmax quirk)
            self.state, self.cross = D.greedy_stream_init(
                engine.variables, memp, tl, cfg=cfg, l_cap=l_cap,
                bos_id=tok.dec_bos)
        self.buffers: List[List[Dict]] = [[] for _ in range(n)]
        self._prev_texts = [""] * n          # beam diff state
        self._texts = [""] * n               # greedy cumulative text
        # Visual-order checkpoints: per-row incremental logical reordering
        # for the greedy char stream (beam texts go through decode_dec,
        # which already returns logical text).
        self._filts = [engine._stream_filter() for _ in range(n)]
        self._stopped = [False] * n          # finished record emitted
        self._t0 = 0                         # global step of next window
        self.done = False

    def advance(self) -> None:
        """Run one decode window for all rows; append its records."""
        if self.done:
            return
        e, tok, cfg = self.e, self.e.tok, self.e.cfg
        if self.method == "beam":
            self.state, hist, all_done = D.beam_stream_window(
                e.variables, self.state, self.cross, self.tl, cfg=cfg,
                k_beam=cfg.BEAM, w=self.window, eos_id=tok.dec_eos,
                unk_dec_id=tok.unk_id + tok.dec_offset)
            htok = hist["tokens"]
            if tok.dec_vocab < 65535:  # shrink the wire payload (tunnel)
                htok = htok.astype(jnp.uint16)
            # ONE transfer per window: history + progress + the done flag.
            toks, lens, scores, fins, steps_done, new_t, all_done = \
                jax.device_get((htok, hist["len"], hist["score"],
                                hist["fin"], self.state.steps_done,
                                self.state.t, all_done))
            for i in range(self.n):
                if self._stopped[i]:
                    continue
                k = max(0, int(steps_done[i]) - self._t0)
                for s in range(k):
                    ids = toks[i, s, 1:lens[i, s]]
                    eos_pos = np.nonzero(ids == tok.dec_eos)[0]
                    if eos_pos.size:
                        ids = ids[: eos_pos[0]]
                    text = tok.decode_dec(ids)
                    prev = self._prev_texts[i]
                    token = text[len(prev):] if len(text) > len(prev) else ""
                    L = max(1, int(lens[i, s]) - 1)
                    confidence = float(min(1.0, max(
                        0.0, np.exp(scores[i, s] / L)))) if L > 0 else 0.0
                    finished = bool(fins[i, s])
                    self.buffers[i].append(
                        {"token": token, "text": text,
                         "confidence": confidence,
                         "step": self._t0 + s + 1, "finished": finished})
                    self._prev_texts[i] = text
                    if finished:
                        self._stopped[i] = True
                        break
        else:
            self.state, hist, all_done = D.greedy_stream_window(
                e.variables, self.state, self.cross, self.tl, cfg=cfg,
                w=self.window, eos_id=tok.dec_eos,
                unk_dec_id=tok.unk_id + tok.dec_offset)
            extra, steps_done, new_t, all_done = jax.device_get(
                (hist["extra"], self.state.steps_done, self.state.t,
                 all_done))
            for i in range(self.n):
                if self._stopped[i]:
                    continue
                k = max(0, int(steps_done[i]) - self._t0)
                for s in range(k):
                    prob, tid = float(extra[i, s, 0]), int(extra[i, s, 1])
                    finished = tid == tok.dec_eos
                    char = ""
                    if not finished and tid not in (tok.dec_pad, tok.dec_bos,
                                                    tok.dec_eos):
                        raw = tid - tok.dec_offset
                        if 0 <= raw < tok.vocab_size:
                            # Reference quirk (model.py:925-930): an <unk>
                            # step yields token='<unk>' but the text stays.
                            char = tok.id_to_token.get(raw, "")
                            if (char != tok.unk_token
                                    and self._filts[i] is not None):
                                char = self._filts[i].push(char)
                            if char != tok.unk_token:
                                self._texts[i] += char
                    if finished and self._filts[i] is not None:
                        tail = self._filts[i].flush()
                        char += tail
                        self._texts[i] += tail
                    self.buffers[i].append(
                        {"token": char, "token_id": tid,
                         "text": self._texts[i], "confidence": prob,
                         "step": self._t0 + s + 1, "finished": finished})
                    if finished:
                        self._stopped[i] = True
                        break
        self._t0 = int(new_t)
        self.done = bool(all_done)

    def row_records(self, i: int) -> Generator[Dict, None, None]:
        emitted = 0
        while True:
            buf = self.buffers[i]
            while emitted < len(buf):
                rec = buf[emitted]
                emitted += 1
                yield rec
            if self._stopped[i] or self.done:
                if not self._stopped[i] and self._filts[i] is not None:
                    # Budget exhausted without EOS: release the held-back
                    # cluster (mirrors _stream_greedy's tail record).
                    tail = self._filts[i].flush()
                    if tail:
                        self._texts[i] += tail
                        yield {"token": tail, "token_id": -1,
                               "text": self._texts[i], "confidence": 0.0,
                               "step": self._t0 + 1, "finished": False}
                return
            self.advance()
