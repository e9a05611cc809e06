"""Sampled speculative decoding must be distribution-exact.

The rejection-sampling acceptance rule (models/qwen3_vl.spec_accept)
guarantees the emitted stream is distributed EXACTLY as sampling from
the target alone — the property that lets ``--draft_model`` compose
with the reference's ``temperature=0.2`` default
(/root/reference/config/llm_config.py) and the multi-temperature
VLM-direct protocol.  Pinned at three levels:

1. unit — ``filtered_log_probs`` is the exact log-density of
   ``sample_rows`` (same temp/top-k/top-p filter), with the temp<=0
   point-mass degeneracy that folds greedy rows into the same rule;
2. law — ``spec_accept`` run as many independent trials emits
   first-position tokens whose empirical distribution matches the
   TARGET distribution p (not the draft q it was proposed from), for
   self-draft, independent-draft, and disjoint-support cases;
3. end-to-end — SpeculativeGenerator with temperature>0 and an
   independent draft produces per-position marginals statistically
   matching the plain sampled generator's, and identical streams for
   identical seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emr2a_tpu.models.qwen3_vl import (
    SAMPLE_TOP_K,
    Qwen3VLGenerator,
    filtered_log_probs,
    sample_rows,
    spec_accept,
)
from emr2a_tpu.models.speculative import SpeculativeGenerator
from tests.test_speculative import PROMPT, init_params, tiny_config


# -- 1. filtered_log_probs is sample_rows' density -----------------------


def np_sample_rows_support(logits, temp, top_p):
    """Reference numpy re-derivation of sample_rows' kept support and
    probabilities for ONE row (temp > 0)."""
    scaled = logits.astype(np.float64) / max(temp, 1e-6)
    k = min(SAMPLE_TOP_K, scaled.shape[-1])
    order = np.argsort(-scaled, kind="stable")[:k]
    vals = scaled[order]
    probs = np.exp(vals - vals.max())
    probs = probs / probs.sum()
    cum = np.cumsum(probs)
    keep = int(np.sum((cum - probs) < top_p))
    cutoff = vals[keep - 1]
    kept = vals >= cutoff
    p = np.zeros_like(scaled)
    w = np.exp(vals[kept] - vals[kept].max())
    p[order[kept]] = w / w.sum()
    return p


def test_filtered_log_probs_matches_sample_rows_density():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 64).astype(np.float32) * 3
    temp = np.array([0.3, 0.7, 1.0, 1.5, 0.5, 2.0], np.float32)
    top_p = np.array([0.5, 0.8, 0.9, 1.0, 0.95, 0.6], np.float32)
    lp = np.asarray(filtered_log_probs(jnp.asarray(logits),
                                       jnp.asarray(temp),
                                       jnp.asarray(top_p)))
    for b in range(6):
        expect = np_sample_rows_support(logits[b], temp[b], top_p[b])
        got = np.exp(lp[b])
        np.testing.assert_allclose(got, expect, atol=1e-5,
                                   err_msg=f"row {b}")
        assert abs(got.sum() - 1.0) < 1e-5


def test_filtered_log_probs_greedy_point_mass():
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 32).astype(np.float32)
    temp = np.array([0.0, -1.0, 0.8], np.float32)
    top_p = np.ones(3, np.float32)
    lp = np.asarray(filtered_log_probs(jnp.asarray(logits),
                                       jnp.asarray(temp),
                                       jnp.asarray(top_p)))
    for b in (0, 1):
        p = np.exp(lp[b])
        assert p[logits[b].argmax()] == pytest.approx(1.0)
        assert p.sum() == pytest.approx(1.0)
    assert (np.exp(lp[2]) > 0).sum() > 1  # sampled row is not a point mass


def test_filtered_log_probs_empirical_matches_sample_rows():
    """Sampling from exp(filtered_log_probs) and calling sample_rows
    directly must produce the same distribution (they share the
    filter); checked by frequency comparison over the same key set."""
    rng = np.random.RandomState(2)
    V, N = 16, 4000
    logits = jnp.asarray(np.tile(rng.randn(1, V).astype(np.float32) * 2,
                                 (N, 1)))
    temp = jnp.full((N,), 0.8, jnp.float32)
    top_p = jnp.full((N,), 0.9, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    direct = np.asarray(sample_rows(logits, keys, temp, top_p))
    lp = filtered_log_probs(logits, temp, top_p)
    keys2 = jax.random.split(jax.random.PRNGKey(1), N)
    via_lp = np.asarray(jax.vmap(jax.random.categorical)(keys2, lp))
    f1 = np.bincount(direct, minlength=V) / N
    f2 = np.bincount(via_lp, minlength=V) / N
    assert 0.5 * np.abs(f1 - f2).sum() < 0.05  # total variation


# -- 2. spec_accept emits target-distributed tokens ----------------------


def run_spec_accept_trials(q_probs, p_probs, n_trials, k, seed=0):
    """n_trials independent (B=n_trials) spec_accept rounds with drafts
    sampled from q; every position shares the given q/p distributions.
    Returns (emitted, n_acc) numpy arrays."""
    V = q_probs.shape[-1]
    q_lp = jnp.log(jnp.clip(jnp.asarray(q_probs), 1e-30, None))
    p_lp = jnp.log(jnp.clip(jnp.asarray(p_probs), 1e-30, None))
    q_lp = jnp.where(jnp.asarray(q_probs) > 0, q_lp, -jnp.inf)
    p_lp = jnp.where(jnp.asarray(p_probs) > 0, p_lp, -jnp.inf)
    q_full = jnp.broadcast_to(q_lp, (n_trials, k, V))
    p_full = jnp.broadcast_to(p_lp, (n_trials, k + 1, V))
    dkeys = jax.random.split(jax.random.PRNGKey(seed), n_trials * k)
    drafts = jax.vmap(jax.random.categorical)(
        dkeys, jnp.broadcast_to(q_lp, (n_trials * k, V))
    ).reshape(n_trials, k).astype(jnp.int32)
    akeys = jax.random.split(jax.random.PRNGKey(seed + 1), n_trials)
    emitted, n_acc = spec_accept(drafts, q_full, p_full, akeys)
    return np.asarray(emitted), np.asarray(n_acc)


@pytest.mark.parametrize("case", ["self", "independent", "disjoint"])
def test_spec_accept_first_token_is_target_distributed(case):
    """The first emitted token's law must be p regardless of q — the
    defining property of lossless speculative sampling."""
    rng = np.random.RandomState(3)
    V, N, k = 8, 20000, 3
    p = rng.dirichlet(np.ones(V)).astype(np.float32)
    if case == "self":
        q = p.copy()
    elif case == "independent":
        q = rng.dirichlet(np.ones(V)).astype(np.float32)
    else:  # draft support misses p's heaviest token entirely
        q = rng.dirichlet(np.ones(V)).astype(np.float32)
        q[p.argmax()] = 0.0
        q = q / q.sum()
    emitted, n_acc = run_spec_accept_trials(q, p, N, k)
    freq = np.bincount(emitted[:, 0], minlength=V) / N
    tv = 0.5 * np.abs(freq - p).sum()
    assert tv < 0.02, (case, tv, freq, p)
    if case == "self":
        # identical distributions accept every draft with prob 1
        assert (n_acc == k).all()


def test_spec_accept_second_position_law():
    """Conditioned on the first draft being accepted, the second
    emitted token must also follow p (per-position independence holds
    in this synthetic setup)."""
    rng = np.random.RandomState(4)
    V, N, k = 6, 20000, 2
    p = rng.dirichlet(np.ones(V)).astype(np.float32)
    q = rng.dirichlet(np.ones(V)).astype(np.float32)
    emitted, n_acc = run_spec_accept_trials(q, p, N, k, seed=9)
    mask = n_acc >= 1  # position 1 was emitted (accepted or correction)
    freq = np.bincount(emitted[mask, 1], minlength=V) / mask.sum()
    assert 0.5 * np.abs(freq - p).sum() < 0.03


def test_spec_accept_greedy_point_mass_degenerates_to_prefix_match():
    """With point-mass q and p (temp<=0 rows), acceptance is exactly
    the longest argmax-matching-prefix rule and emission is
    deterministic."""
    V, k = 10, 3
    rng = np.random.RandomState(5)
    t_logits = rng.randn(k + 1, V).astype(np.float32)
    d_logits = rng.randn(k, V).astype(np.float32)
    zero = jnp.zeros((k,), jnp.float32)
    q_lp = filtered_log_probs(jnp.asarray(d_logits), zero,
                              jnp.ones((k,), jnp.float32))
    p_lp = filtered_log_probs(jnp.asarray(t_logits),
                              jnp.zeros((k + 1,), jnp.float32),
                              jnp.ones((k + 1,), jnp.float32))
    drafts = jnp.asarray(d_logits.argmax(-1))[None].astype(jnp.int32)
    for seed in range(4):  # deterministic: key must not matter
        emitted, n_acc = spec_accept(
            drafts, q_lp[None], p_lp[None],
            jax.random.split(jax.random.PRNGKey(seed), 1))
        t_arg = t_logits.argmax(-1)
        d_arg = d_logits.argmax(-1)
        expect_acc = 0
        while expect_acc < k and d_arg[expect_acc] == t_arg[expect_acc]:
            expect_acc += 1
        assert int(n_acc[0]) == expect_acc
        assert int(emitted[0, expect_acc]) == int(t_arg[expect_acc])


# -- 3. end-to-end: SpeculativeGenerator with temperature > 0 ------------


def test_sampled_speculative_deterministic_per_seed():
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 7)
    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=2, eos_token_id=-1)
    a = spec.generate(PROMPT, max_new_tokens=6, prompt_bucket=16,
                      temperature=0.7, top_p=0.9, seed=13)
    b = spec.generate(PROMPT, max_new_tokens=6, prompt_bucket=16,
                      temperature=0.7, top_p=0.9, seed=13)
    c = spec.generate(PROMPT, max_new_tokens=6, prompt_bucket=16,
                      temperature=0.7, top_p=0.9, seed=14)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # different seed explores


def test_sampled_speculative_marginals_match_plain_sampler():
    """Per-position token marginals from the speculative sampled path
    (independent draft — real rejections happen) must match the plain
    generator's sampled marginals over many seeds."""
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 7)
    # temp 0.3 concentrates the tiny model's sampled support to ~5
    # effective tokens (measured), giving the two-sample TV comparison
    # real power at 400 seeds: expected noise ~0.06, tolerance 0.15
    temp, top_p, n_seeds, n_tok = 0.3, 0.9, 400, 3

    gen = Qwen3VLGenerator(tmodel, tparams, eos_token_id=-1)
    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=2, eos_token_id=-1)
    plain_toks = np.stack([
        gen.generate(PROMPT, max_new_tokens=n_tok, prompt_bucket=16,
                     temperature=temp, top_p=top_p, seed=1000 + s)[0]
        for s in range(n_seeds)])
    spec_toks = np.stack([
        spec.generate(PROMPT, max_new_tokens=n_tok, prompt_bucket=16,
                      temperature=temp, top_p=top_p, seed=2000 + s)[0]
        for s in range(n_seeds)])
    V = cfg.text.vocab_size
    for pos in range(n_tok):
        f_plain = np.bincount(plain_toks[:, pos], minlength=V) / n_seeds
        f_spec = np.bincount(spec_toks[:, pos], minlength=V) / n_seeds
        tv = 0.5 * np.abs(f_plain - f_spec).sum()
        assert tv < 0.15, (pos, tv)


def test_sampled_speculative_greedy_key_unchanged():
    """temperature=0 through the new signature still takes the
    lossless greedy program (no rng in the token math)."""
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 5)
    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=3, eos_token_id=-1)
    gen = Qwen3VLGenerator(tmodel, tparams, eos_token_id=-1)
    expected = gen.generate(PROMPT, max_new_tokens=8, prompt_bucket=16)
    a = spec.generate(PROMPT, max_new_tokens=8, prompt_bucket=16,
                      temperature=0.0, seed=3)
    b = spec.generate(PROMPT, max_new_tokens=8, prompt_bucket=16,
                      temperature=0.0, seed=99)
    np.testing.assert_array_equal(a, expected)
    np.testing.assert_array_equal(b, expected)
