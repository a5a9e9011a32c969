"""Autoregressive generation: jitted prefill + lax.while_loop decode.

Replaces the reference's HF ``GenerationMixin`` loop (Python-per-step) with a
single compiled program: vision encoding + compression + prefill and the full
decode loop run on-device; only the final token buffer returns to the host.
Stopping matches ``KeywordsStoppingCriteria`` with ``keywords=[eos]``
(``/root/reference/hicom/__init__.py:99-100``): generation ends at eos (the
API layer additionally trims decoded keyword strings).
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


@functools.partial(
    jax.jit,
    static_argnames=("model", "modal", "max_new_tokens", "temperature", "top_p", "eos_token_id", "cache_len", "has_frames"),
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
        logits = m.language_model.logits(last_hidden)[:, 0]  # (b, vocab)

        # single-use keys: the loop splits the carried key again, so consume a
        # distinct subkey here (rng is a closure var — don't rebind it)
        loop_rng, first_key = jax.random.split(rng)
        first_tok = sample_token(logits, first_key, temperature, top_p)

        out = jnp.full((b, max_new_tokens), eos_token_id, dtype=jnp.int32)
        out = out.at[:, 0].set(first_tok.astype(jnp.int32))
        done = first_tok == eos_token_id

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
            return step + 1, cache, out, done, rng

        state = (jnp.int32(1), cache, out, done, loop_rng)
        _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
        return out

    return model.apply(variables, method=run)
