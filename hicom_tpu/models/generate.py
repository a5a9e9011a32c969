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
    static_argnames=("model", "modal", "max_new_tokens", "temperature", "top_p", "eos_token_id", "cache_len", "has_frames", "stop_sequences"),
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
) -> Array:
    """Returns (b, max_new_tokens) generated ids, eos-padded after stop."""

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
        return _sample_and_loop(m, cache, last_hidden, true_len, rng,
                                max_new_tokens, temperature, top_p,
                                eos_token_id, stop_sequences)

    return model.apply(variables, method=run)


def _sample_and_loop(m, cache, last_hidden, true_len, rng, max_new_tokens,
                     temperature, top_p, eos_token_id, stop_sequences):
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
    _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
    return out


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
