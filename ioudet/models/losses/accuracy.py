"""Top-k accuracy metric (ref: mmdet/models/losses/accuracy.py)."""

import jax.numpy as jnp


def accuracy(pred, target, topk=1):
    ks = (topk,) if isinstance(topk, int) else tuple(topk)
    maxk = max(ks)
    order = jnp.argsort(pred, axis=-1)[..., ::-1][..., :maxk]  # (N, maxk)
    correct = order == target[..., None]
    res = []
    for k in ks:
        acc = jnp.sum(jnp.any(correct[..., :k], axis=-1)) / pred.shape[0] * 100.0
        res.append(acc)
    return res[0] if isinstance(topk, int) else res
