"""Frozen-parameter discipline: masked-out leaves (FrozenBN statistics,
frozen backbone stages) must receive EXACT zero updates — optax.masked would
pass raw gradients through, which silently corrupts running stats."""

import numpy as np
import jax
import jax.numpy as jnp

from ioudet.apis.train import build_optimizer, make_trainable_mask


class TestFrozenUpdates:
    def test_masked_leaves_get_zero_updates(self):
        params = {
            "backbone": {
                "conv1": {"kernel": jnp.ones((2, 2))},
                "bn1": {"scale": jnp.ones((2,)), "mean": jnp.zeros((2,)),
                        "var": jnp.ones((2,))},
                "layer2_0": {"conv1": {"kernel": jnp.ones((2, 2))}},
            },
            "head": {"kernel": jnp.ones((2, 2))},
        }
        mask = make_trainable_mask(params, frozen_stages=1)
        tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9,
                                  weight_decay=0.01), lambda s: 0.1, mask)
        opt_state = tx.init(params)
        grads = jax.tree.map(lambda x: jnp.ones_like(x), params)  # nonzero!
        updates, _ = tx.update(grads, opt_state, params)
        # frozen: stem conv + BN stats -> exactly zero update
        assert float(jnp.abs(updates["backbone"]["conv1"]["kernel"]).max()) == 0
        assert float(jnp.abs(updates["backbone"]["bn1"]["mean"]).max()) == 0
        assert float(jnp.abs(updates["backbone"]["bn1"]["var"]).max()) == 0
        # trainable leaves move
        assert float(jnp.abs(updates["head"]["kernel"]).max()) > 0
        assert float(jnp.abs(
            updates["backbone"]["layer2_0"]["conv1"]["kernel"]).max()) > 0
        # BN affine of unfrozen stages trains
        assert float(jnp.abs(updates["backbone"]["bn1"]["scale"]).max()) == 0  # bn1 is stem: frozen

    def test_weight_decay_not_applied_to_frozen(self):
        params = {"backbone": {"conv1": {"kernel": jnp.full((2,), 10.0)}},
                  "head": {"kernel": jnp.full((2,), 10.0)}}
        mask = make_trainable_mask(params, frozen_stages=0)
        tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.0,
                                  weight_decay=1.0), lambda s: 0.1, mask)
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["backbone"]["conv1"]["kernel"]).max()) == 0
        # unfrozen head decays: update = -lr * wd * param = -1.0
        np.testing.assert_allclose(np.asarray(updates["head"]["kernel"]),
                                   -1.0, rtol=1e-6)
