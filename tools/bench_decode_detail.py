"""Device-vs-host split of the beam and rescoring phases on the TPU.

Times, for the headline setup (flagship bf16, B=32×2051, peaky head):
  - beam scan device program alone (scalar-sync) vs host unpack
  - rescoring: host nbest packing / device program / host fetch+argmax
Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _t(fn, iters=6):
    fn(); fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    return (time.perf_counter() - t0) / iters, out


def main():
    # persistent XLA compile cache: repeated runs (and the round-end driver's
    # submetric subprocesses) reload compiled programs instead of re-stressing
    # the remote compile service
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()
    import dataclasses
    from reverb_tpu.decode import prefix_beam as pb
    from reverb_tpu.decode import rescoring as rs
    from reverb_tpu.decode.api import encode_and_ctc, encode_and_ctc_topk
    from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank_batch
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large, reverb_small

    dev = jax.devices()[0]
    on_tpu = dev.platform != 'cpu'
    conf = reverb_large() if on_tpu else reverb_small()
    cfg = ModelConfig.from_config(conf)
    cfg = cfg.with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    CHUNK, B, BEAM, SKIP = 2051, (32 if on_tpu else 2), 10, 0.95
    sr = 16000
    samples = int(CHUNK * 0.01 * sr) + 400
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 1000)
    feats_lens = jnp.full((B,), CHUNK, jnp.int32)
    cat = jnp.asarray(np.array([1.0, 0.0], np.float32))

    @jax.jit
    def frontend(w):
        return compute_fbank_batch(w, FbankConfig())[:, :CHUNK]

    feats = frontend(wave)
    params['ctc']['ctc_lo'] = dict(params['ctc']['ctc_lo'])
    params['ctc']['ctc_lo']['weight'] = params['ctc']['ctc_lo']['weight'] * 8
    logits = np.asarray(encode_and_ctc(params, cfg, feats[:4], feats_lens[:4],
                                       cat)[2], np.float32)
    blank = logits[..., cfg.blank_id]
    non_blank = np.max(np.delete(logits, cfg.blank_id, -1), -1)
    bias = float(np.quantile((non_blank - blank).reshape(-1), 0.75))
    b = params['ctc']['ctc_lo']['bias']
    params['ctc']['ctc_lo']['bias'] = b.at[cfg.blank_id].add(
        jnp.asarray(bias, b.dtype))

    out = encode_and_ctc_topk(params, cfg, feats, feats_lens, cat, BEAM)
    encoder_out, encoder_lens, tk_logp, tk_idx, blank_lp = out

    def sync(tree):
        leaf = jax.tree.leaves(tree)[0]
        float(leaf[(0,) * leaf.ndim].astype(jnp.float32))
        return tree

    d = {}
    keep_cap = tk_logp.shape[1] // 2

    # beam: device program alone (Pallas kernel vs lax.scan), then host
    # unpack alone
    import os

    def run_beam():
        return sync(pb.ctc_prefix_beam_search_device_topk(
            tk_logp, tk_idx, blank_lp, encoder_lens, BEAM, cfg.blank_id, 0,
            SKIP, keep_cap, None))

    beam_dev, beam_out = _t(run_beam)
    d['beam_device'] = round(beam_dev, 4)
    d['beam_kernel_used'] = bool(pb._use_beam_kernel())
    if d['beam_kernel_used']:
        os.environ['REVERB_TPU_NO_BEAM_KERNEL'] = '1'
        pb.ctc_prefix_beam_search_device_topk.clear_cache()
        beam_scan, _ = _t(run_beam)
        d['beam_device_lax_scan'] = round(beam_scan, 4)
        os.environ['REVERB_TPU_NO_BEAM_KERNEL'] = ''
        pb.ctc_prefix_beam_search_device_topk.clear_cache()
    d['beam_host_unpack'], prefix = _t(
        lambda: pb._pack_results(*beam_out))
    d['beam_host_unpack'] = round(d['beam_host_unpack'], 4)

    # rescoring split: packing / device / post
    encoder_lens_np = np.asarray(encoder_lens)

    def pack():
        Nmax = max(len(p.nbest) for p in prefix)
        Lmax = max(len(h) for p in prefix for h in p.nbest)
        Lb = rs._bucket(Lmax)
        hyps_pad = np.zeros((B, Nmax, Lb), dtype=np.int32)
        lens = np.zeros((B, Nmax), dtype=np.int32)
        for bb, pre in enumerate(prefix):
            for i, h in enumerate(pre.nbest):
                hyps_pad[bb, i, :len(h)] = h
                lens[bb, i] = len(h)
        return hyps_pad, lens

    d['rescore_host_pack'], (hyps_pad, lens) = _t(pack)
    d['rescore_host_pack'] = round(d['rescore_host_pack'], 4)

    resc_dev, _ = _t(lambda: sync(rs._rescore_device_all(
        params, cfg, jnp.asarray(hyps_pad), jnp.asarray(lens),
        encoder_out, 0.0, cat, jnp.asarray(encoder_lens_np))))
    d['rescore_device'] = round(resc_dev, 4)

    full, _ = _t(lambda: rs.attention_rescoring(
        params, cfg, prefix, encoder_out, encoder_lens, 0.1, 0.0,
        cat_embs=cat))
    d['rescore_full'] = round(full, 4)
    d['hyp_len_bucket'] = int(hyps_pad.shape[2])
    print(json.dumps(d))


if __name__ == '__main__':
    main()
