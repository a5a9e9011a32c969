"""Autoregressive generation: jitted prefill + lax.while_loop decode.

Replaces the reference's HF ``GenerationMixin`` loop (Python-per-step) with a
single compiled program: vision encoding + compression + prefill and the full
decode loop run on-device; only the final token buffer returns to the host.

Stopping matches ``KeywordsStoppingCriteria``
(``/root/reference/hicom/mm_utils.py:684-715``): generation ends at eos, and
additionally when the tail of the generated ids equals any keyword's token-id
sequence (``stop_sequences``, a static tuple — the reference's
``keyword_id`` match at ``mm_utils.py:702-704``). The reference's secondary
decoded-string containment check (``mm_utils.py:705-708``) can't run inside a
jitted loop; the API layer applies it as a post-decode trim, which yields the
same returned text. One intentional divergence: the reference's token match
can span the prompt/generation boundary during the first ``len(keyword)-1``
steps; ours matches within generated tokens only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .qwen2 import KVCache

Array = jnp.ndarray


def sample_token(logits: Array, rng, temperature: float, top_p: float) -> Array:
    """logits (b, vocab) → token (b,). Greedy when temperature == 0."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / temperature
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the top-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff_logit = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def keyword_token_sequences(keywords, tokenizer) -> tuple:
    """Tokenize stop keywords the way ``KeywordsStoppingCriteria.__init__``
    does (``mm_utils.py:686-697``): plain ``tokenizer(kw).input_ids`` with a
    leading bos stripped. Returns a hashable tuple-of-tuples for the jitted
    loop's static ``stop_sequences`` argument."""
    seqs = []
    for kw in keywords:
        ids = list(tokenizer(kw).input_ids)
        if len(ids) > 1 and tokenizer.bos_token_id is not None and ids[0] == tokenizer.bos_token_id:
            ids = ids[1:]
        if ids:
            seqs.append(tuple(int(i) for i in ids))
    return tuple(seqs)


@functools.partial(
    jax.jit,
    static_argnames=("model", "modal", "max_new_tokens", "temperature", "top_p", "eos_token_id", "cache_len", "has_frames", "stop_sequences", "spec_k", "spec_ngram", "return_stats"),
)
def generate_tokens(
    variables,
    input_ids: Array,  # (b, L) with modal sentinel(s)
    frames: Optional[Array],  # (b, t, 3, H, W) or None
    guide_ids: Optional[Array],
    guide_mask: Optional[Array],
    rng: Array,
    attention_mask: Optional[Array] = None,  # (b, L) bool; None = all real
    visual_embeds: Optional[Array] = None,  # (b, V, D) precomputed (anyres path)
    *,
    model,
    modal: str = "video",
    max_new_tokens: int = 128,
    temperature: float = 0.0,
    top_p: float = 0.9,
    eos_token_id: int = 0,
    cache_len: int = 4096,
    has_frames: bool = True,
    stop_sequences: tuple = (),
    spec_k: int = 0,
    spec_ngram: int = 3,
    return_stats: bool = False,
) -> Array:
    """Returns (b, max_new_tokens) generated ids, eos-padded after stop
    (with ``return_stats``: a ``(ids, decode_iterations)`` tuple — under
    speculation, emitted tokens per iteration = the decode speedup factor,
    since a verify step is weight-streaming-bound like a single-token step).

    ``spec_k > 0`` enables prompt-lookup speculative decoding (greedy,
    unpadded b=1 only — silently ignored otherwise): each loop iteration
    drafts ``spec_k`` continuation tokens by matching the last ``spec_ngram``
    generated tokens against the on-device token history (prompt +
    generation), then verifies all drafts in ONE decoder step of
    ``spec_k + 1`` positions. Decode at these scales is weight-streaming
    bound, so a verify step costs ~one normal step; every accepted draft is
    a free token. Greedy outputs are exactly those of ``spec_k=0``."""

    def run(m):
        cfg = m.config
        b = input_ids.shape[0]

        visual = visual_embeds
        if has_frames and visual is None:
            guide_embeds = None
            if cfg.guide_enabled():
                guide_embeds = m.encode_guide(guide_ids, guide_mask)
            visual = m.encode_visual(frames, guide_embeds, modal)
        spliced = m.embed_and_splice(input_ids, visual, attention_mask)

        tc = cfg.text_config
        dtype = jnp.dtype(cfg.dtype)
        cache = KVCache.zeros(
            tc.num_hidden_layers, b, tc.num_key_value_heads, cache_len, tc.head_dim, dtype,
            quantized=getattr(tc, "kv_cache_int8", False),
        )
        # b=1 unpadded prompts splice to an all-valid mask; passing None lets
        # the causal flash kernel run the prefill.
        prefill_pm = None if (attention_mask is None and b == 1 and has_frames) else spliced.attention_mask
        hidden, cache = m.language_model.model(
            spliced.embeds, spliced.positions, cache, padding_mask=prefill_pm, prefill_from_empty=True
        )
        true_len = jnp.sum(spliced.attention_mask.astype(jnp.int32), axis=1)  # (b,)
        last_idx = true_len - 1
        last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)  # (b, 1, D)
        # speculative decode needs an unpadded single row (cache validity is
        # recomputed as arange < length each verify step) and greedy sampling
        spec = spec_k if (spec_k > 0 and temperature == 0.0 and b == 1
                          and attention_mask is None) else 0
        return _sample_and_loop(m, cache, last_hidden, true_len, rng,
                                max_new_tokens, temperature, top_p,
                                eos_token_id, stop_sequences,
                                spec_k=spec, spec_ngram=spec_ngram,
                                prompt_ids=input_ids, return_stats=return_stats)

    return model.apply(variables, method=run)


def _pld_draft(hist: Array, hist_len: Array, ngram: int, k: int) -> Array:
    """Prompt-lookup draft: find the most recent position where the last
    ``ngram`` tokens of ``hist[:hist_len]`` previously occurred and return the
    ``k`` tokens that followed (zeros when there is no match — they simply
    won't be accepted). O(|hist|·ngram) elementwise work: negligible next to
    a decoder step."""
    size = hist.shape[0]
    tail = jax.lax.dynamic_slice(hist, (hist_len - ngram,), (ngram,))
    ok = jnp.ones((size,), bool)
    for j in range(ngram):
        ok &= jnp.roll(hist, -j) == tail[j]  # hist[i+j] == tail[j]
    # candidate window must end strictly before the tail occurrence itself
    ok &= jnp.arange(size) < (hist_len - ngram)
    best = jnp.max(jnp.where(ok, jnp.arange(size), -1))
    start = jnp.clip(jnp.where(best >= 0, best + ngram, 0), 0, size - k)
    return jax.lax.dynamic_slice(hist, (start,), (k,))


def _spec_loop(m, cache, out, done, true_len, loop_rng, prompt_ids,
               max_new_tokens, eos_token_id, stop_sequences, spec_k, spec_ngram):
    """Greedy prompt-lookup speculative decode (b=1, unpadded). Per iteration:
    ONE decoder step over ``spec_k + 1`` positions (current token + drafts)
    written contiguously at the logical cache offset; the longest prefix of
    drafts matching the step's own greedy argmaxes is accepted, emitting
    ``accepted + 1`` tokens. Cache length/validity are recomputed each
    iteration (arange < logical_len), so the unaccepted tail slots written by
    a verify step are dropped and overwritten by the next one. Exact greedy
    parity with the one-token loop by construction: every emitted token is an
    argmax conditioned on exactly the accepted history."""
    b, k1 = 1, spec_k + 1
    cache_max = cache.valid.shape[1]
    Lp = prompt_ids.shape[1]
    # token history for the n-gram lookup: prompt ids (modal sentinels stay
    # as-is — they never match generated text) + generated tokens
    hist = jnp.zeros((Lp + max_new_tokens + k1,), jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, prompt_ids[0].astype(jnp.int32), (0,))
    hist = jax.lax.dynamic_update_slice(hist, out[0, :1], (Lp,))  # first token
    # slack buffer: a verify step writes k1 candidates past `step`
    buf = jnp.full((b, max_new_tokens + k1), eos_token_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, out[:, :1], (0, 0))

    def cond(state):
        step, _, _, _, done, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, cache, buf, hist, done, it = state
        cur = jax.lax.dynamic_slice(buf, (0, step - 1), (b, 1))[0]  # (1,)
        # true_len counts the SPLICED prompt; hist holds the raw prompt ids
        hist_len = Lp + step
        draft = _pld_draft(hist, hist_len, spec_ngram, spec_k)
        q_toks = jnp.concatenate([cur.astype(jnp.int32), draft.astype(jnp.int32)])
        embeds = m.language_model.embed(q_toks[None])  # (1, k1, D)
        positions = (true_len[0] + step - 1 + jnp.arange(k1))[None]
        clen = true_len[0] + step - 1  # logical cache length (slots == rope
        # positions: b=1 unpadded prompts have no pad slots)
        cache_r = cache._replace(
            length=jnp.full_like(cache.length, clen),
            valid=jnp.arange(cache_max)[None, :] < clen,
        )
        hidden, cache_r = m.language_model.model(embeds, positions, cache_r)
        g = jnp.argmax(
            m.language_model.logits(hidden).astype(jnp.float32)[0], axis=-1
        ).astype(jnp.int32)  # (k1,) greedy next-token at each position
        accepted = jnp.cumprod((draft == g[:spec_k]).astype(jnp.int32))
        emit = jnp.concatenate([jnp.ones((1,), bool), accepted.astype(bool)])
        buf = jax.lax.dynamic_update_slice(buf, g[None], (0, step))
        # stopping: eos or keyword-tail hit at an emitted position ends the
        # emission AT that token (it is still emitted, like the plain loop)
        stop_vec = g == eos_token_id
        for seq in stop_sequences:
            ks = len(seq)
            kw = jnp.asarray(seq, jnp.int32)
            for i in range(k1):
                tail = jax.lax.dynamic_slice(buf, (0, step + i - (ks - 1)), (b, ks))[0]
                stop_vec = stop_vec.at[i].set(
                    stop_vec[i] | (jnp.all(tail == kw) & (step + i + 1 >= ks)))
        stops = stop_vec & emit
        before_stop = jnp.cumsum(
            jnp.concatenate([jnp.zeros((1,), jnp.int32), stops.astype(jnp.int32)[:-1]])) == 0
        keep = emit & before_stop
        n_emit = jnp.sum(keep.astype(jnp.int32))
        hist = jax.lax.dynamic_update_slice(hist, g, (hist_len,))
        done = done | jnp.any(stops & keep)[None]
        return step + n_emit, cache_r, buf, hist, done, it + 1

    state = (jnp.int32(1), cache, buf, hist, done, jnp.int32(0))
    step, _, buf, _, _, it = jax.lax.while_loop(cond, body, state)
    # trim: candidates written past the final emission count revert to eos
    out = buf[:, :max_new_tokens]
    out = jnp.where(jnp.arange(max_new_tokens)[None, :] < step, out, eos_token_id)
    return out, it


def _sample_and_loop(m, cache, last_hidden, true_len, rng, max_new_tokens,
                     temperature, top_p, eos_token_id, stop_sequences,
                     spec_k: int = 0, spec_ngram: int = 3, prompt_ids=None,
                     return_stats: bool = False):
    """Shared tail of generation: sample the first token from the prefill's
    last hidden state, then run the jitted decode while_loop. Used by both
    :func:`generate_tokens` and :func:`decode_tokens` (the ring-prefill path)."""
    b = last_hidden.shape[0]
    logits = m.language_model.logits(last_hidden)[:, 0]  # (b, vocab)

    # single-use keys: the loop splits the carried key again, so consume a
    # distinct subkey here (rng is a closure var — don't rebind it)
    loop_rng, first_key = jax.random.split(rng)
    first_tok = sample_token(logits, first_key, temperature, top_p)

    out = jnp.full((b, max_new_tokens), eos_token_id, dtype=jnp.int32)
    out = out.at[:, 0].set(first_tok.astype(jnp.int32))
    done = first_tok == eos_token_id
    for seq in stop_sequences:  # single-token keywords can stop at step 0
        if len(seq) == 1:
            done = done | (first_tok == seq[0])

    if spec_k > 0:
        out, iters = _spec_loop(m, cache, out, done, true_len, loop_rng,
                                prompt_ids, max_new_tokens, eos_token_id,
                                stop_sequences, spec_k, spec_ngram)
        return (out, iters) if return_stats else out

    def cond(state):
        step, _, _, done, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, cache, out, done, rng = state
        cur = out[:, step - 1]
        embeds = m.language_model.embed(cur[:, None])
        # rope position = per-row true length (pads excluded), not cache slot
        positions = (true_len + step - 1)[:, None]
        hidden, cache = m.language_model.model(embeds, positions, cache)
        logits = m.language_model.logits(hidden)[:, 0]
        rng, sub = jax.random.split(rng)
        tok = sample_token(logits, sub, temperature, top_p).astype(jnp.int32)
        tok = jnp.where(done, eos_token_id, tok)
        out = out.at[:, step].set(tok)
        done = done | (tok == eos_token_id)
        # keyword stop: tail of generated ids ending at `step` equals a
        # keyword's token ids (unrolled over the small static set)
        for seq in stop_sequences:
            k = len(seq)
            kw = jnp.asarray(seq, jnp.int32)
            tail = jax.lax.dynamic_slice(out, (jnp.int32(0), step - (k - 1)), (b, k))
            done = done | (jnp.all(tail == kw, axis=1) & (step + 1 >= k))
        return step + 1, cache, out, done, rng

    state = (jnp.int32(1), cache, out, done, loop_rng)
    step, _, out, _, _ = jax.lax.while_loop(cond, body, state)
    return (out, step - 1) if return_stats else out


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "temperature", "top_p",
                     "eos_token_id", "stop_sequences"),
)
def decode_tokens(
    variables,
    cache: KVCache,  # prefilled (e.g. by parallel/ring.py:ring_prefill)
    last_hidden: Array,  # (b, 1, D) final-norm hidden of the last real token
    true_len: Array,  # (b,) prompt true lengths (rope positions continue here)
    rng: Array,
    *,
    model,
    max_new_tokens: int = 128,
    temperature: float = 0.0,
    top_p: float = 0.9,
    eos_token_id: int = 0,
    stop_sequences: tuple = (),
) -> Array:
    """Decode loop over an externally-prefilled KV cache. The ring-prefill
    path (prompts beyond one bucket/HBM) prefills across the mesh, then
    decodes here exactly as :func:`generate_tokens` would."""

    def run(m):
        return _sample_and_loop(m, cache, last_hidden, true_len, rng,
                                max_new_tokens, temperature, top_p,
                                eos_token_id, stop_sequences)

    return model.apply(variables, method=run)
