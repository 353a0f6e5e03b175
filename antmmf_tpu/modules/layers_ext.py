"""Extended layer library: CRF, non-local attention, TSN consensus, small
classic-mmf blocks.

Reference parity: ``/root/reference/antmmf/modules/layers/`` — ``CRF``
(crf.py:9, linear-chain conditional random field with start/end/transition
scores, masked log-likelihood + Viterbi decode), ``ConsensusModule``
(consensus_module.py, TSN segment consensus), ``GatedTanh``
(gated_tanh.py), ``ConditionalLayerNorm`` (conditional_layer_norm.py);
``/root/reference/antmmf/modules/vision/non_local.py`` (embedded-gaussian
non-local block).

TPU design: the CRF recursions are single ``lax.scan`` loops (static
sequence length, mask-driven), so likelihood AND Viterbi run jitted
on-device — the reference decodes in a Python loop on host.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class CRF(nn.Module):
    """Linear-chain CRF (reference layers/crf.py:9-342, batch-first).

    ``log_likelihood(emissions [B, L, T], tags int[B, L], mask [B, L])``
    and ``decode(emissions, mask) -> int[B, L]`` (Viterbi; padded steps
    repeat the last valid tag).
    """

    num_tags: int

    def setup(self) -> None:
        init = nn.initializers.uniform(scale=0.2)  # ≈ U(-0.1, 0.1) centered

        def centered(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - 0.1

        self.start_transitions = self.param("start_transitions", centered,
                                            (self.num_tags,))
        self.end_transitions = self.param("end_transitions", centered,
                                          (self.num_tags,))
        self.transitions = self.param("transitions", centered,
                                      (self.num_tags, self.num_tags))

    # ------------------------------------------------------------ likelihood
    def _score(self, emissions, tags, mask):
        """Numerator: score of the gold path (ref _compute_score)."""
        B, L, T = emissions.shape
        first = tags[:, 0]
        score = self.start_transitions[first] \
            + jnp.take_along_axis(emissions[:, 0], first[:, None], 1)[:, 0]

        def step(carry, t):
            score, prev = carry
            cur = tags[:, t]
            emit = jnp.take_along_axis(emissions[:, t], cur[:, None], 1)[:, 0]
            trans = self.transitions[prev, cur]
            m = mask[:, t]
            score = score + (trans + emit) * m
            prev = jnp.where(m > 0, cur, prev)
            return (score, prev), None

        (score, last), _ = jax.lax.scan(step, (score, first),
                                        jnp.arange(1, L))
        return score + self.end_transitions[last]

    def _normalizer(self, emissions, mask):
        """Denominator: log-partition via the forward algorithm."""
        L = emissions.shape[1]
        alpha = self.start_transitions[None] + emissions[:, 0]  # [B, T]

        def step(alpha, t):
            # [B, T_prev, 1] + [T_prev, T_cur] + [B, 1, T_cur]
            scores = alpha[:, :, None] + self.transitions[None] \
                + emissions[:, t][:, None, :]
            nxt = jax.nn.logsumexp(scores, axis=1)
            m = mask[:, t][:, None]
            return jnp.where(m > 0, nxt, alpha), None

        alpha, _ = jax.lax.scan(step, alpha, jnp.arange(1, L))
        return jax.nn.logsumexp(alpha + self.end_transitions[None], axis=1)

    def log_likelihood(self, emissions, tags, mask=None,
                       reduction: str = "sum"):
        if mask is None:
            mask = jnp.ones(tags.shape, jnp.float32)
        mask = mask.astype(jnp.float32)
        emissions = emissions.astype(jnp.float32)
        llh = self._score(emissions, tags, mask) \
            - self._normalizer(emissions, mask)
        if reduction == "none":
            return llh
        if reduction == "sum":
            return llh.sum()
        if reduction == "mean":
            return llh.mean()
        if reduction == "token_mean":
            return llh.sum() / jnp.maximum(mask.sum(), 1.0)
        raise ValueError(f"invalid reduction: {reduction}")

    __call__ = log_likelihood

    # ---------------------------------------------------------------- decode
    def decode(self, emissions, mask=None):
        """Viterbi best path, jitted: forward max-scan storing argmax
        pointers, reverse scan to backtrace (ref _viterbi_decode)."""
        B, L, T = emissions.shape
        if mask is None:
            mask = jnp.ones((B, L), jnp.float32)
        mask = mask.astype(jnp.float32)
        emissions = emissions.astype(jnp.float32)
        score = self.start_transitions[None] + emissions[:, 0]

        def fwd(carry, t):
            score = carry
            cand = score[:, :, None] + self.transitions[None] \
                + emissions[:, t][:, None, :]
            best_prev = jnp.argmax(cand, axis=1)  # [B, T]
            nxt = jnp.max(cand, axis=1)
            m = mask[:, t][:, None]
            new = jnp.where(m > 0, nxt, score)
            # padded steps: pointer = identity (keep the same tag)
            ptr = jnp.where(m > 0, best_prev,
                            jnp.broadcast_to(jnp.arange(T)[None], (B, T)))
            return new, ptr

        score, ptrs = jax.lax.scan(fwd, score, jnp.arange(1, L))
        last = jnp.argmax(score + self.end_transitions[None], axis=1)  # [B]

        def back(tag, ptr):
            prev = jnp.take_along_axis(ptr, tag[:, None], 1)[:, 0]
            return prev, tag

        if L == 1:
            return last[:, None]
        # reverse scan: emits the tag at positions 1..L-1 (original order),
        # final carry = the tag at position 0
        tag0, rev_tags = jax.lax.scan(back, last, ptrs, reverse=True)
        return jnp.concatenate(
            [tag0[:, None], jnp.moveaxis(rev_tags, 0, 1)], axis=1)


class ConsensusModule(nn.Module):
    """TSN segment consensus (reference layers/consensus_module.py):
    avg or identity over the segment axis."""

    consensus_type: str = "avg"
    dim: int = 1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.consensus_type == "avg":
            return x.mean(axis=self.dim, keepdims=True)
        if self.consensus_type == "identity":
            return x
        raise ValueError(f"unknown consensus {self.consensus_type!r}")


class NonLocalBlock(nn.Module):
    """Embedded-gaussian non-local block (reference vision/non_local.py):
    y = x + W_z · softmax(θ(x)·φ(x)ᵀ)·g(x), channels halved inside,
    works on [B, ..., C] grids of any spatial rank (2D/3D)."""

    sub_sample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        inter = max(1, C // 2)
        B = x.shape[0]
        flat = x.reshape(B, -1, C)  # [B, N, C]
        theta = nn.Dense(inter, dtype=self.dtype, name="theta")(flat)
        phi = nn.Dense(inter, dtype=self.dtype, name="phi")(flat)
        g = nn.Dense(inter, dtype=self.dtype, name="g")(flat)
        if self.sub_sample:  # stride-2 pooling on keys/values (ref maxpool)
            phi = phi[:, ::2]
            g = g[:, ::2]
        att = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi).astype(jnp.float32), -1
        ).astype(self.dtype)
        y = jnp.einsum("bnm,bmc->bnc", att, g)
        y = nn.Dense(C, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="w_z")(y)
        return x + y.reshape(x.shape)


class GatedTanh(nn.Module):
    """y = tanh(Wx) ∘ σ(W'x) (reference layers/gated_tanh.py — the classic
    VQA fusion nonlinearity)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.tanh(nn.Dense(self.features, dtype=self.dtype, name="fc")(x))
        gate = nn.sigmoid(nn.Dense(self.features, dtype=self.dtype,
                                   name="gate_fc")(x))
        return y * gate


class ConditionalLayerNorm(nn.Module):
    """LayerNorm whose scale/bias are predicted from a conditioning vector
    (reference layers/conditional_layer_norm.py)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        normed = (xf - mu) / jnp.sqrt(var + self.epsilon)
        scale = 1.0 + nn.Dense(C, kernel_init=nn.initializers.zeros,
                               name="scale")(cond)
        bias = nn.Dense(C, kernel_init=nn.initializers.zeros,
                        name="bias")(cond)
        while scale.ndim < normed.ndim:
            scale, bias = scale[:, None], bias[:, None]
        return (normed * scale + bias).astype(self.dtype)


class ExU(nn.Module):
    """Exp-centered unit from Neural Additive Models (reference
    layers/exu.py): relu_n((x − b) · e^W), ReLU capped at n."""

    out_features: int
    n: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param("weights", nn.initializers.truncated_normal(0.5),
                       (in_features, self.out_features))
        w = w + 4.0  # trunc-normal mean 4.0 (NAM paper init, ref :26-27)
        b = self.param("bias", nn.initializers.truncated_normal(0.5),
                       (in_features,))
        out = (x - b) @ jnp.exp(w)
        return jnp.clip(nn.relu(out), 0.0, self.n)


class VAE(nn.Module):
    """Label-conditioned latent head (reference layers/vae.py:9-121):
    prior from the input, posterior from input + label embedding; returns
    (KL, z). Sampling uses the ``sample`` rng collection; without targets
    z = prior mean and KL is None (inference path, like the reference).
    """

    out_dim: int
    class_num: int
    hidden_dim: Optional[int] = None
    dropout: float = 0.2

    @nn.compact
    def __call__(self, input_emb: jnp.ndarray,
                 targets: Optional[jnp.ndarray] = None,
                 prototype_emb: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        hidden = self.hidden_dim or input_emb.shape[-1]
        act = nn.tanh
        p_z = act(nn.Dense(self.out_dim, name="prior")(input_emb))
        p_mu = nn.Dense(self.out_dim, name="prior_mu")(p_z)
        p_sigma2 = jnp.exp(nn.Dense(self.out_dim,
                                    name="prior_log_sigma")(p_z))
        if targets is None:
            return None, p_mu

        t = targets.astype(jnp.float32)
        denom = jnp.maximum(t.sum(-1, keepdims=True), 1.0)
        if prototype_emb is not None:
            label = (t @ prototype_emb) / denom
        else:
            label = nn.Dense(hidden, name="taskid2labelembedding")(t) / denom
            label = nn.Dense(hidden, name="hidden2hidden")(label)
        label = nn.Dropout(self.dropout)(act(label),
                                         deterministic=deterministic)
        q_z = act(nn.Dense(self.out_dim, name="posterior")(
            jnp.concatenate([input_emb, label], axis=-1)))
        q_mu = nn.Dense(self.out_dim, name="posterior_mu")(q_z)
        q_sigma2 = jnp.exp(nn.Dense(self.out_dim,
                                    name="posterior_log_sigma")(q_z))
        eps = jax.random.normal(self.make_rng("sample"), q_mu.shape)
        z = q_mu + eps * jnp.sqrt(q_sigma2)
        kl = -0.5 * jnp.sum(
            jnp.log(q_sigma2 / p_sigma2) - q_sigma2 / p_sigma2
            - (q_mu - p_mu) ** 2 / p_sigma2 + 1.0, axis=-1).mean()
        return kl, z
