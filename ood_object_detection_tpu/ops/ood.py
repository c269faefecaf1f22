"""Per-anchor out-of-distribution scores over detection class logits.

The OOD capability of the reference lives in its meta/episodic harness
(infer.py); for the deployment path the BASELINE.json north star asks for
on-device per-anchor energy / max-logit OOD scoring fused with detection.
Higher score == more in-distribution (so AUROC uses known=positive).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def energy_score(logits: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """Negative free energy: T * logsumexp(logits / T) over the class axis.

    (Liu et al., "Energy-based Out-of-distribution Detection", NeurIPS 2020.)
    """
    return temperature * jax.scipy.special.logsumexp(logits / temperature, axis=-1)


def max_logit_score(logits: jnp.ndarray) -> jnp.ndarray:
    """Max unnormalized logit over classes (Hendrycks et al., 2022)."""
    return jnp.max(logits, axis=-1)


def msp_score(logits: jnp.ndarray) -> jnp.ndarray:
    """Maximum softmax probability. For sigmoid-based detectors the per-class
    sigmoid max is the analogous confidence measure."""
    return jnp.max(jax.nn.sigmoid(logits), axis=-1)


_SCORERS = {
    "energy": energy_score,
    "max_logit": max_logit_score,
    "msp": msp_score,
}


def ood_score(logits: jnp.ndarray, method: str = "energy", **kwargs) -> jnp.ndarray:
    return _SCORERS[method](logits, **kwargs)
