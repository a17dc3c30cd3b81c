"""Loss library — pure JAX functions.

Reference: training/losses.py (all classes).  Each loss is a pure function
(or a pure function + explicit state for the EMA-smoothed MI estimator),
jit-friendly and differentiable.  Images are NHWC, sequences batch-major.
"""
from __future__ import annotations

import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from playablevideogeneration_tpu.utils import tensor_ops as tops

_EPS = sys.float_info.epsilon


def _align_right(ground_truth: jnp.ndarray, reconstructed: jnp.ndarray):
    """Right-aligns a length T-1 reconstruction against a length T ground
    truth sequence (reference losses.py:83-87)."""
    t_gt, t_rec = ground_truth.shape[1], reconstructed.shape[1]
    if t_rec != t_gt:
        if t_rec != t_gt - 1:
            raise ValueError(f"Sequence lengths {t_gt} vs {t_rec} are incompatible")
        ground_truth = ground_truth[:, 1:]
    return ground_truth, reconstructed


def states_loss(states: jnp.ndarray, reconstructed_states: jnp.ndarray) -> jnp.ndarray:
    """MSE between state sequences (reference losses.py:14-27)."""
    return jnp.mean((states - reconstructed_states) ** 2)


def hidden_states_loss(hidden_states: jnp.ndarray,
                       reconstructed_hidden_states: jnp.ndarray) -> jnp.ndarray:
    """MSE between hidden-state sequences; left-trims a 1-longer
    reconstruction (reference losses.py:30-53)."""
    t, t_rec = hidden_states.shape[1], reconstructed_hidden_states.shape[1]
    if t_rec != t:
        if t_rec - 1 != t:
            raise ValueError(f"Sequence lengths {t} vs {t_rec} are incompatible")
        reconstructed_hidden_states = reconstructed_hidden_states[:, 1:]
    return jnp.mean((hidden_states - reconstructed_hidden_states) ** 2)


def observations_loss(observations: jnp.ndarray, reconstructed_observations: jnp.ndarray,
                      weight_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 reconstruction loss on the current frame of each observation.

    Ground truth is bilinearly resized to the reconstruction resolution;
    optional per-pixel weight-mask mode normalizes per frame
    (reference losses.py:56-118).

    :param observations: (B, T, H, W, 3*stacking) in [-1, 1]
    :param reconstructed_observations: (B, T|T-1, h, w, 3)
    :param weight_mask: optional (B, T, H', W', 1)
    """
    observations = observations[..., :3]  # current frame only (losses.py:71)
    observations, reconstructed_observations = _align_right(
        observations, reconstructed_observations)

    h, w = reconstructed_observations.shape[2:4]
    flat_obs = tops.flatten(observations)
    flat_rec = tops.flatten(reconstructed_observations)
    flat_obs = tops.resize_bilinear(flat_obs, h, w)

    if weight_mask is not None:
        if weight_mask.shape[1] != reconstructed_observations.shape[1]:
            weight_mask = weight_mask[:, 1:]
        flat_mask = tops.flatten(weight_mask)
        flat_mask = tops.resize_bilinear(flat_mask, h, w)
        unreduced = jnp.abs(flat_obs - flat_rec) * flat_mask
        per_frame = unreduced.sum(axis=(1, 2))  # (N, 3)
        denom = flat_mask.sum(axis=(1, 2)) * 3.0  # (N, 1); mask broadcast over channels
        return jnp.mean(per_frame / denom)

    return jnp.mean(jnp.abs(flat_obs - flat_rec))


def kl_divergence_categorical(input_logits: jnp.ndarray,
                              target_logits: jnp.ndarray) -> jnp.ndarray:
    """KL between two categorical logit sets, batchmean reduction
    (reference losses.py:121-143)."""
    a = input_logits.shape[-1]
    p_log = jax.nn.log_softmax(input_logits.reshape((-1, a)), axis=-1)
    q = jax.nn.softmax(target_logits.reshape((-1, a)), axis=-1)
    q_log = jax.nn.log_softmax(target_logits.reshape((-1, a)), axis=-1)
    return jnp.sum(q * (q_log - p_log)) / p_log.shape[0]


def kl_gaussian_divergence(distribution_parameters: jnp.ndarray) -> jnp.ndarray:
    """KL(diag Gaussian || N(0, 1)) from (mean, variance) pairs
    (reference losses.py:146-169).

    The 1e-20 floor under the log is invisible at reference numerics
    (the torch f32 version never reaches it) but keeps the loss and its
    gradient finite if a sharpened posterior's variance underflows to
    exactly 0 — without it one such sample NaNs the entire train step."""
    d = distribution_parameters.shape[-1]
    p = distribution_parameters.reshape((-1, 2, d)).astype(jnp.float32)
    mean, variance = p[:, 0], p[:, 1]
    kl = 1.0 + jnp.log(jnp.maximum(variance, 1e-20)) - mean**2 - variance
    return -0.5 * jnp.mean(kl.sum(axis=-1))


def kl_general_gaussian_divergence(distribution_parameters: jnp.ndarray,
                                   reference_distribution_parameters: jnp.ndarray,
                                   eps: float = 0.05) -> jnp.ndarray:
    """KL between two diag Gaussians; variances detached and clamped >= eps
    (reference losses.py:172-209)."""
    d = distribution_parameters.shape[-1]
    p = distribution_parameters.reshape((-1, 2, d)).astype(jnp.float32)
    q = reference_distribution_parameters.reshape((-1, 2, d)).astype(jnp.float32)
    mean = p[:, 0]
    variance = jax.lax.stop_gradient(p[:, 1])
    ref_mean = q[:, 0]
    ref_variance = jax.lax.stop_gradient(q[:, 1])

    # Same 1e-20 underflow floor as kl_gaussian_divergence: reference-
    # invisible, but a single zero variance must not NaN the step.
    log_variance = jnp.log(jnp.maximum(variance, 1e-20))
    ref_log_variance = jnp.log(jnp.maximum(ref_variance, 1e-20))
    variance = jnp.clip(variance, min=eps)
    ref_variance = jnp.clip(ref_variance, min=eps)

    kl = (ref_log_variance - log_variance - 1.0 + variance / ref_variance
          + (ref_mean - mean) ** 2 / ref_variance)
    return 0.5 * jnp.mean(kl.sum(axis=-1))


def entropy_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean entropy of categorical logits (reference losses.py:339-356)."""
    a = logits.shape[-1]
    flat = logits.reshape((-1, a))
    p = jax.nn.softmax(flat, axis=-1)
    log_p = jax.nn.log_softmax(flat, axis=-1)
    return -jnp.sum(p * log_p) / flat.shape[0]


def entropy_probabilities(probabilities: jnp.ndarray) -> jnp.ndarray:
    """Mean entropy of probability vectors (reference losses.py:359-376).

    Uses xlogy so exact one-hot inputs (produced by the one-hot and
    ground-truth action samplers during evaluation) yield 0·log 0 = 0
    instead of NaN.
    """
    a = probabilities.shape[-1]
    flat = probabilities.reshape((-1, a))
    return -jnp.sum(jax.scipy.special.xlogy(flat, flat)) / flat.shape[0]


# --------------------------------------------------------------------- #
# Mutual information                                                    #
# --------------------------------------------------------------------- #


def joint_probability_matrix(distribution_1: jnp.ndarray,
                             distribution_2: jnp.ndarray) -> jnp.ndarray:
    """Symmetrized, normalized (A, A) joint probability matrix from two sets
    of categorical samples (reference losses.py:243-267)."""
    dim = distribution_1.shape[-1]
    d1 = distribution_1.reshape((-1, dim))
    d2 = distribution_2.reshape((-1, dim))
    p = jnp.einsum("ni,nj->ij", d1, d2)
    p = (p + p.T) / 2.0
    return p / p.sum()


def mutual_information_from_joint(joint: jnp.ndarray, lamb: float = 1.0,
                                  eps: float = _EPS) -> jnp.ndarray:
    """-MI of a joint probability matrix; `lamb` rescales the marginal
    entropy terms (reference losses.py:269-302)."""
    rows, cols = joint.shape
    marg_r = jnp.broadcast_to(joint.sum(axis=1)[:, None], (rows, cols))
    marg_c = jnp.broadcast_to(joint.sum(axis=0)[None, :], (rows, cols))
    joint = jnp.clip(joint, min=eps)
    marg_r = jnp.clip(marg_r, min=eps)
    marg_c = jnp.clip(marg_c, min=eps)
    mi = joint * (jnp.log(joint) - lamb * jnp.log(marg_r) - lamb * jnp.log(marg_c))
    return -mi.sum()


def mutual_information_loss(distribution_1: jnp.ndarray, distribution_2: jnp.ndarray,
                            lamb: float = 1.0) -> jnp.ndarray:
    """IIC-style -MI between action distributions on real vs reconstructed
    sequences (reference losses.py:238-302)."""
    return mutual_information_from_joint(
        joint_probability_matrix(distribution_1, distribution_2), lamb)


def smooth_mutual_information_loss(
    distribution_1: jnp.ndarray,
    distribution_2: jnp.ndarray,
    estimated_matrix: jnp.ndarray,
    alpha: float,
    lamb: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MI loss with an EMA-smoothed joint matrix.

    The reference holds the EMA matrix in a requires_grad=False parameter
    mutated in-place (losses.py:212-235,305-336); here it is explicit state:
    returns (loss, new_estimated_matrix).  Gradients flow into the current
    batch's alpha-weighted contribution exactly as in the reference (the
    old matrix enters detached).
    """
    current = joint_probability_matrix(distribution_1, distribution_2)
    smoothed = jax.lax.stop_gradient(estimated_matrix) * (1.0 - alpha) + current * alpha
    loss = mutual_information_from_joint(smoothed, lamb)
    return loss, jax.lax.stop_gradient(smoothed)


def init_mi_matrix(actions_count: int) -> jnp.ndarray:
    """Uniform independent joint matrix (reference losses.py:224-227)."""
    return jnp.full((actions_count, actions_count),
                    1.0 / (actions_count * actions_count), dtype=jnp.float32)


# --------------------------------------------------------------------- #
# Perceptual loss                                                       #
# --------------------------------------------------------------------- #


def perceptual_loss(
    vgg_apply,
    observations: jnp.ndarray,
    reconstructed_observations: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray] = None,
    batched_gt: bool = False,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Sum of per-level L1 distances over VGG19 feature maps.

    :param vgg_apply: function (N, H, W, 3) -> list of 5 feature maps
        (see models/vgg.py)
    :param observations: (B, T, H, W, 3*stacking) ground truth in [-1, 1]
    :param reconstructed_observations: (B, T|T-1, h, w, 3)
    :param batched_gt: run the gt and reconstruction VGG passes as ONE
        batch-concatenated invocation (3 invocations/step instead of 6).
        Mathematically identical (the gt half is sliced back out under
        stop_gradient); the FLOP tradeoff is measured on-chip — the VGG
        backward then runs over 2N frames where only N carry nonzero
        cotangents (tpu.vgg_batched_gt, docs/PROFILE_r4.md discipline).
    :return: (total_loss, per_level_losses) (reference losses.py:494-588)
    """
    gt = observations[..., :3]
    gt, rec = _align_right(gt, reconstructed_observations)
    h, w = rec.shape[2:4]

    flat_gt = tops.flatten(gt)
    flat_rec = tops.flatten(rec)
    if flat_gt.shape[1:3] != (h, w):
        flat_gt = tops.resize_bilinear(flat_gt, h, w)

    if batched_gt:
        n = flat_rec.shape[0]
        both = vgg_apply(jnp.concatenate(
            [jax.lax.stop_gradient(flat_gt), flat_rec], axis=0))
        gt_features = [jax.lax.stop_gradient(f[:n]) for f in both]
        rec_features = [f[n:] for f in both]
    else:
        gt_features = jax.lax.stop_gradient(
            vgg_apply(jax.lax.stop_gradient(flat_gt)))
        rec_features = vgg_apply(flat_rec)

    if weight_mask is not None and weight_mask.shape[1] != rec.shape[1]:
        weight_mask = weight_mask[:, 1:]
    flat_mask = tops.flatten(weight_mask) if weight_mask is not None else None

    total = jnp.zeros((), dtype=jnp.float32)
    singles = []
    for f_gt, f_rec in zip(gt_features, rec_features):
        if f_rec.shape[1] == 0 or f_rec.shape[2] == 0:
            # Tiny inputs can pool to zero-size maps at deep VGG levels
            # (mean over an empty tensor is NaN); contribute zero instead.
            singles.append(jnp.zeros(()))
            continue
        if flat_mask is None:
            level = jnp.mean(jnp.abs(f_gt - f_rec))
        else:
            fh, fw, fc = f_rec.shape[1], f_rec.shape[2], f_rec.shape[3]
            mask = tops.resize_bilinear(flat_mask, fh, fw)
            unreduced = jnp.abs(f_gt - f_rec) * mask
            per_image = unreduced.sum(axis=(1, 2, 3))
            denom = mask.sum(axis=(1, 2, 3)) * fc
            level = jnp.mean(per_image / denom)
        total = total + level
        singles.append(level)
    return total, singles


# --------------------------------------------------------------------- #
# Motion weight mask                                                    #
# --------------------------------------------------------------------- #


def motion_weight_mask(observations: jnp.ndarray,
                       reconstructed_observations: jnp.ndarray,
                       weight_bias: float = 0.0) -> jnp.ndarray:
    """|frame-diff GT| + |frame-diff recon|, channel-summed + bias, with a
    constant first element (reference losses.py:591-649).

    :return: (B, T, H, W, 1)
    """
    observations = jax.lax.stop_gradient(observations)[..., :3]
    rec = jax.lax.stop_gradient(reconstructed_observations)
    if rec.shape[1] != observations.shape[1]:
        rec = jnp.concatenate([observations[:, 0:1], rec], axis=1)

    succ, pred = observations[:, 1:], observations[:, :-1]
    r_succ, r_pred = rec[:, 1:], rec[:, :-1]
    mask = jnp.abs(succ - pred) + jnp.abs(r_succ - r_pred)
    mask = mask.sum(axis=-1, keepdims=True) + weight_bias
    first = jnp.ones_like(mask[:, 0:1])
    return jnp.concatenate([first, mask], axis=1)


# --------------------------------------------------------------------- #
# Per-position sequence losses (evaluation)                             #
# --------------------------------------------------------------------- #


def sequence_loss(loss_fn, ground_truth_sequence: jnp.ndarray,
                  reconstructed_sequence: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluates `loss_fn` at each sequence position, right-aligning a
    length T-1 reconstruction (reference losses.py:652-713).

    :return: (avg_loss, (T,) per-position losses; position 0 is zero when
             the reconstruction is one frame shorter)
    """
    t_gt = ground_truth_sequence.shape[1]
    t_rec = reconstructed_sequence.shape[1]
    offset = t_gt - t_rec
    if offset not in (0, 1):
        raise ValueError(f"Sequence lengths {t_gt} vs {t_rec} are incompatible")

    terms = []
    for i in range(offset):
        terms.append(jnp.zeros(()))
    for i in range(t_rec):
        value = loss_fn(ground_truth_sequence[:, i + offset : i + offset + 1],
                        reconstructed_sequence[:, i : i + 1])
        if isinstance(value, tuple):
            value = value[0]
        terms.append(value)
    terms = jnp.stack(terms)
    avg = jnp.mean(terms[offset:])
    return avg, terms
