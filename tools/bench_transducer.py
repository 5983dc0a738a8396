"""Transducer decode throughput on the attached TPU — the first measured
xRT for this decode family (r3 verdict Weak #5/Next #8).

Prices a production-shaped transducer: flagship-scale conformer encoder
output (already computed — this tool times DECODE only, the encoder is the
same one the headline bench prices), RNN predictor + additive joint at
reverb-class dims, over B utterances of 20.5 s chunks (T=512 encoder
frames at 40 ms).

Three searches:
  - greedy  (models/transducer.transducer_greedy_device — lax.scan)
  - tsd     (decode/transducer_device.tsd_device — lax.scan, the
             TPU-first formulation of the espnet host loop)
  - tsd_host (decode/transducer_search.time_sync_decoding — the
             batched-dispatch host loop, for the idiom A/B)

Prints one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from reverb_tpu.decode.transducer_search import beam_search_transducer
    from reverb_tpu.export.aot import maybe_enable_default_cache
    from reverb_tpu.models.transducer import (TransducerConfig,
                                              init_transducer,
                                              transducer_greedy_search)
    maybe_enable_default_cache()

    dev = jax.devices()[0]
    on_tpu = dev.platform != 'cpu'
    B = 32 if on_tpu else 2
    T = 512 if on_tpu else 64            # encoder frames (40 ms each)
    D = 1024 if on_tpu else 64
    V = 10000 if on_tpu else 200
    chunk_sec = T * 0.04
    cfg = TransducerConfig(
        vocab_size=V, encoder_output_size=D, predictor='rnn',
        predictor_embed_size=512 if on_tpu else 32,
        predictor_hidden_size=512 if on_tpu else 32,
        predictor_layers=2 if on_tpu else 1,
        join_dim=512 if on_tpu else 32)
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    # blank-dominant joint: the regime trained RNN-Ts live in
    params['joint']['ffn_out']['bias'] = \
        params['joint']['ffn_out']['bias'].at[cfg.blank_id].add(4.0)

    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = np.full((B,), T, np.int32)

    out = {'metric': 'transducer decode xRT (flagship-dim RNN predictor + '
                     f'joint, B={B}x{chunk_sec:.1f}s encoder chunks, '
                     'decode only)',
           'unit': 'x realtime per chip',
           'device': getattr(dev, 'device_kind', dev.platform)}

    def time_it(fn, iters=4 if on_tpu else 1):
        fn()                              # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return B * chunk_sec * iters / (time.perf_counter() - t0)

    out['greedy_xrt'] = round(time_it(
        lambda: transducer_greedy_search(params, enc, lens, cfg)), 1)
    out['tsd_device_xrt'] = round(time_it(
        lambda: beam_search_transducer(params, cfg, enc, lens,
                                       search_type='tsd', beam_size=4,
                                       max_sym_exp=2)), 1)
    if os.environ.get('REVERB_BENCH_TSD_HOST', '1') == '1':
        # the host loop is slow over a remote link: one utterance suffices
        e1, l1 = enc[:1], lens[:1]
        t0 = time.perf_counter()
        beam_search_transducer(params, cfg, e1, l1, search_type='tsd_host',
                               beam_size=4, max_sym_exp=2)
        out['tsd_host_xrt_1utt'] = round(
            chunk_sec / (time.perf_counter() - t0), 2)
    out['value'] = out['tsd_device_xrt']
    print(json.dumps(out))


if __name__ == '__main__':
    main()
