"""CRF lattice scans: forward/backward log-sum-exp and Viterbi over the
4^state_len k-mer state space.

Lattice semantics (parity with dorado/basecall/decode/CPUDecoder.cpp:17-99):
  - state s encodes the most recent `state_len` bases, newest base in the low
    two bits;
  - a *step* transition p -> s exists iff s == ((p << 2) | b) & mask; its
    score lives at flat index s*4 + r where r = p >> 2*(state_len-1) is the
    dropped oldest base of p;
  - every state also has a *stay* with a fixed score (the model's
    blank_score);
  - forward/backward scores alpha/beta are computed with log-sum-exp over the
    5 incoming/outgoing transitions; posteriors = softmax(alpha + beta).

The scans are expressed as `jax.lax.scan` over time with the per-step update
as pure gather + LSE on [N, S] score blocks — XLA keeps the whole update in
VMEM-resident fused loops on TPU. Batched over chunks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e38


def predecessor_index(num_states: int) -> np.ndarray:
    """idx[s, r] = r*(num_states//4) + s//4: the 4 states that can step into s."""
    s = np.arange(num_states)
    r = np.arange(4)
    return (r[None, :] * (num_states // 4) + (s[:, None] >> 2)).astype(np.int32)


def successor_index(num_states: int) -> np.ndarray:
    """succ[s, b] = ((s << 2) | b) & mask: the 4 states reachable from s."""
    s = np.arange(num_states)
    b = np.arange(4)
    return (((s[:, None] << 2) | b[None, :]) & (num_states - 1)).astype(np.int32)


@partial(jax.jit, static_argnames=("reverse",))
def _lse_scan(scores_step: jnp.ndarray, stay_score: float, idx: jnp.ndarray,
              gather_flat: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Shared forward/backward LSE scan.

    scores_step: [T, N, S, 4] step-transition scores (already permuted for the
    chosen direction); idx: [S, 4] source-state gather; gather_flat selects
    nothing extra here but keeps the signature uniform.
    """
    t_len, n, s, _ = scores_step.shape

    def step(alpha, ms_t):
        # ms_t: [N, S, 4]; alpha: [N, S]
        stepped = alpha[:, idx] + ms_t  # [N, S, 4]
        stay = alpha + stay_score  # [N, S]
        m = jnp.maximum(jnp.max(stepped, axis=-1), stay)
        summed = jnp.sum(jnp.exp(stepped - m[..., None]), axis=-1) + jnp.exp(stay - m)
        new_alpha = m + jnp.log(summed)
        return new_alpha, new_alpha

    init = jnp.zeros((n, s), scores_step.dtype)
    xs = jnp.flip(scores_step, axis=0) if reverse else scores_step
    _, hist = jax.lax.scan(step, init, xs)
    hist = jnp.concatenate([init[None], hist], axis=0)  # [T+1, N, S]
    if reverse:
        hist = jnp.flip(hist, axis=0)
    return hist


def forward_scores(scores_tnc: jnp.ndarray, fixed_stay_score: float) -> jnp.ndarray:
    """alpha over time: [T, N, C] transition scores -> [T+1, N, S] f32."""
    t_len, n, c = scores_tnc.shape
    num_states = c // 4
    ms = scores_tnc.reshape(t_len, n, num_states, 4).astype(jnp.float32)
    idx = jnp.asarray(predecessor_index(num_states))
    return _lse_scan(ms, fixed_stay_score, idx, idx, reverse=False)


def backward_scores(scores_tnc: jnp.ndarray, fixed_stay_score: float) -> jnp.ndarray:
    """beta over time: [T, N, C] transition scores -> [T+1, N, S] f32.

    The backward recursion gathers, for each state s, the scores of the 4
    transitions *out of* s (into succ[s, b]), i.e. flat score index
    (succ[s,b])*4 + oldest_base(s).
    """
    t_len, n, c = scores_tnc.shape
    num_states = c // 4
    succ = successor_index(num_states)  # [S, 4]
    # oldest base of s = s >> 2*(state_len-1); state_len = log4(num_states)
    state_len = int(round(np.log(num_states) / np.log(4)))
    oldest = (np.arange(num_states) >> (2 * (state_len - 1))).astype(np.int32)
    out_flat = (succ * 4 + oldest[:, None]).astype(np.int32)  # [S, 4]

    ms_out = scores_tnc.astype(jnp.float32)[:, :, out_flat]  # [T, N, S, 4]
    succ_j = jnp.asarray(succ)
    return _lse_scan(ms_out, fixed_stay_score, succ_j, succ_j, reverse=True)


def posterior_scores(
    scores_tnc: jnp.ndarray, fixed_stay_score: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (posts [T+1, N, S] softmax(fwd+bwd), bwd [T+1, N, S])."""
    fwd = forward_scores(scores_tnc, fixed_stay_score)
    bwd = backward_scores(scores_tnc, fixed_stay_score)
    posts = jax.nn.softmax(fwd + bwd, axis=-1)
    return posts, bwd


def viterbi_path(scores_tnc: jnp.ndarray, fixed_stay_score: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact max-scoring path through the lattice.

    Returns (states [T, N] int32, moves [T, N] uint8) where moves[t]=0 marks a
    stay. Uses a max-scan storing per-step argmax choices, then a reverse
    traceback scan. moves[0] is forced to 1 (a path always emits its first
    k-mer), matching decode semantics downstream.
    """
    t_len, n, c = scores_tnc.shape
    num_states = c // 4
    ms = scores_tnc.reshape(t_len, n, num_states, 4).astype(jnp.float32)
    idx = jnp.asarray(predecessor_index(num_states))

    def fwd_step(alpha, ms_t):
        stepped = alpha[:, idx] + ms_t  # [N, S, 4]
        stay = alpha + fixed_stay_score  # [N, S]
        best_step = jnp.max(stepped, axis=-1)
        best_r = jnp.argmax(stepped, axis=-1).astype(jnp.int32)  # [N, S]
        is_stay = stay >= best_step
        new_alpha = jnp.where(is_stay, stay, best_step)
        # choice: 4 = stay, 0..3 = predecessor slot r
        choice = jnp.where(is_stay, 4, best_r).astype(jnp.int8)
        return new_alpha, choice

    init = jnp.zeros((n, num_states), jnp.float32)
    final_alpha, choices = jax.lax.scan(fwd_step, init, ms)  # choices [T, N, S]

    last_state = jnp.argmax(final_alpha, axis=-1).astype(jnp.int32)  # [N]

    def back_step(state, choice_t):
        # choice_t: [N, S]
        ch = jnp.take_along_axis(choice_t, state[:, None], axis=1)[:, 0]  # [N]
        stayed = ch == 4
        prev = jnp.where(
            stayed,
            state,
            idx[state, jnp.clip(ch, 0, 3).astype(jnp.int32)],
        )
        move = jnp.where(stayed, 0, 1).astype(jnp.uint8)
        return prev, (state, move)

    _, (states_rev, moves_rev) = jax.lax.scan(
        back_step, last_state, jnp.flip(choices, axis=0)
    )
    states = jnp.flip(states_rev, axis=0)
    moves = jnp.flip(moves_rev, axis=0)
    moves = moves.at[0].set(1)
    return states, moves
