"""Subprocess worker for the flash-dropout integration test.

Runs on ONE cpu device (the dropout kernel path is gated to single-device
processes, and the main suite forces 8 virtual devices) and compares a full
`compute_loss` train step — attention dropout engaged — between the fused
flash path (interpret mode) and the unfused XLA formulation, same rng.
Prints one JSON line with the loss values and the max relative grad diff.
"""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('XLA_FLAGS', None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_platforms', 'cpu')


def main():
    from reverb_tpu.models.asr_model import (ModelConfig, compute_loss,
                                             init_params)
    from reverb_tpu.ops import flash_attention as fa

    assert jax.device_count() == 1, jax.devices()

    config = {
        'input_dim': 16,
        'encoder': 'conformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': 2, 'dropout_rate': 0.1,
            'positional_dropout_rate': 0.1, 'attention_dropout_rate': 0.2,
            'input_layer': 'conv2d', 'pos_enc_layer_type': 'rel_pos',
            'selfattention_layer_type': 'rel_selfattn',
            'activation_type': 'swish', 'macaron_style': True,
            'use_cnn_module': True, 'cnn_module_kernel': 15,
            'cnn_module_norm': 'batch_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 2, 'r_num_blocks': 1,
                         'dropout_rate': 0.1},
        'model': 'asr_model',
        'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3,
                       'lsm_weight': 0.1, 'length_normalized_loss': False},
        'ctc_conf': {'ctc_blank_id': 0},
        'output_dim': 10,
    }
    cfg = ModelConfig.from_config(config)
    params = init_params(jax.random.PRNGKey(0), cfg)

    B, T, F, L = 2, 37, 16, 5
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {
        'feats': jax.random.normal(ks[0], (B, T, F), jnp.float32),
        'feats_lengths': jnp.asarray([T, T - 9], jnp.int32),
        'target': jnp.asarray(
            np.where(np.arange(L)[None, :] < np.asarray([5, 3])[:, None],
                     np.asarray(jax.random.randint(ks[1], (B, L), 2, 9)),
                     -1), jnp.int32),
        'target_lengths': jnp.asarray([5, 3], jnp.int32),
    }
    rng = jax.random.PRNGKey(42)

    def run(use_flash):
        fa.set_use_pallas(use_flash)
        try:
            loss, grads = jax.value_and_grad(
                lambda p: compute_loss(p, cfg, batch, rng=rng)['loss'])(params)
        finally:
            fa.set_use_pallas(None)
        return float(loss), grads

    loss_flash, g_flash = run(True)
    loss_xla, g_xla = run(False)

    flat_f, _ = jax.tree_util.tree_flatten(g_flash)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    max_rel = 0.0
    for a, b in zip(flat_f, flat_x):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        max_rel = max(max_rel, float(np.abs(a - b).max() / denom))

    print(json.dumps({'loss_flash': loss_flash, 'loss_xla': loss_xla,
                      'max_rel_grad': max_rel}))


if __name__ == '__main__':
    sys.exit(main())
