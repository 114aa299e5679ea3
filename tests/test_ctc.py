"""CTC ops vs torch.nn.CTCLoss / brute-force oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kiri_tpu.ops.ctc import ctc_alignment_scores, ctc_loss, greedy_ctc_stats

torch = pytest.importorskip("torch")


def _rand_problem(rng, b=4, t=20, c=10, lmax=6):
    logits = rng.normal(size=(b, t, c)).astype(np.float32)
    labels = rng.integers(2, c, (b, lmax)).astype(np.int32)
    label_lens = rng.integers(1, lmax + 1, (b,)).astype(np.int32)
    for i in range(b):
        labels[i, label_lens[i]:] = 0
    return logits, labels, label_lens


def test_ctc_loss_matches_torch():
    rng = np.random.default_rng(0)
    logits, labels, label_lens = _rand_problem(rng)
    b, t, c = logits.shape
    logit_lens = np.full((b,), t, np.int32)

    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                          jnp.asarray(labels), jnp.asarray(label_lens)))

    lp = torch.log_softmax(torch.tensor(logits), dim=-1).permute(1, 0, 2)
    loss = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)(
        lp, torch.tensor(labels, dtype=torch.long),
        torch.tensor(logit_lens, dtype=torch.long),
        torch.tensor(label_lens, dtype=torch.long))
    assert abs(ours - float(loss)) < 1e-3


def test_ctc_loss_variable_frame_lens():
    rng = np.random.default_rng(1)
    logits, labels, label_lens = _rand_problem(rng)
    b, t, c = logits.shape
    logit_lens = rng.integers(12, t + 1, (b,)).astype(np.int32)

    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                          jnp.asarray(labels), jnp.asarray(label_lens)))
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).permute(1, 0, 2)
    loss = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)(
        lp, torch.tensor(labels, dtype=torch.long),
        torch.tensor(logit_lens, dtype=torch.long),
        torch.tensor(label_lens, dtype=torch.long))
    assert abs(ours - float(loss)) < 1e-3


def test_ctc_loss_empty_targets_masked():
    rng = np.random.default_rng(2)
    logits, labels, label_lens = _rand_problem(rng)
    label_lens[0] = 0
    b, t, _ = logits.shape
    out = float(ctc_loss(jnp.asarray(logits), jnp.asarray(np.full((b,), t, np.int32)),
                         jnp.asarray(labels), jnp.asarray(label_lens)))
    assert np.isfinite(out)


def test_ctc_loss_gradient_flows():
    rng = np.random.default_rng(3)
    logits, labels, label_lens = _rand_problem(rng, b=2, t=12, c=8, lmax=4)
    b, t, _ = logits.shape

    def f(x):
        return ctc_loss(x, jnp.full((b,), t, jnp.int32),
                        jnp.asarray(labels), jnp.asarray(label_lens))

    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_alignment_score_matches_manual_forward():
    """Brute-force: sum probability over all valid CTC alignments."""
    rng = np.random.default_rng(4)
    t, c = 5, 6
    logits = rng.normal(size=(1, t, c)).astype(np.float32)
    labels = np.array([[3, 4]], np.int32)
    label_lens = np.array([2], np.int32)
    lp = np.log(np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True))

    import itertools

    def collapse(path):
        out = []
        prev = None
        for s in path:
            if s != prev and s != 0:
                out.append(s)
            prev = s
        return out

    total = -np.inf
    for path in itertools.product(range(c), repeat=t):
        if collapse(path) == [3, 4]:
            total = np.logaddexp(total, sum(lp[i, s] for i, s in enumerate(path)))
    expected = total / 2  # length-normalized

    got = float(ctc_alignment_scores(jnp.asarray(lp[None]),
                                     jnp.asarray(labels),
                                     jnp.asarray(label_lens))[0])
    assert abs(got - expected) < 1e-4


def test_alignment_score_empty_label():
    rng = np.random.default_rng(5)
    lp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(1, 4, 5)),
                                        jnp.float32), axis=-1)
    got = float(ctc_alignment_scores(lp, jnp.zeros((1, 3), jnp.int32),
                                     jnp.zeros((1,), jnp.int32))[0])
    expected = float(jnp.mean(lp[0, :, 0]))
    assert abs(got - expected) < 1e-5


def test_greedy_ctc_stats():
    # Frames argmax to: blank, a, a, blank, b  => est_len 2
    logits = np.full((1, 5, 6), -10.0, np.float32)
    for t, k in enumerate([0, 3, 3, 0, 4]):
        logits[0, t, k] = 10.0
    ids, conf, est = greedy_ctc_stats(jnp.asarray(logits))
    assert list(np.asarray(ids)[0]) == [0, 3, 3, 0, 4]
    assert int(est[0]) == 2
    assert float(conf[0]) > 0.99
