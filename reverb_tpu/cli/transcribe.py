"""Upstream-style `wenet` transcribe CLI (hub models, align mode).

Parity: asr/wenet/cli/transcribe.py:29-81 — `-l/--language` picks a hub
model (downloaded via cli/hub.py), `-m/--model_dir` overrides with a local
model, `--align --label TEXT` runs CTC forced alignment instead of
decoding, `-t/--show_tokens_info` adds token times/confidences,
`--context_path/--context_score` enable context biasing.
"""

from __future__ import annotations

import argparse
import json


def get_args(argv=None):
    p = argparse.ArgumentParser(description='transcribe (hub models)')
    p.add_argument('audio_file', help='audio file to transcribe')
    p.add_argument('-l', '--language', default='english',
                   help='hub language tag (cli/hub.py)')
    p.add_argument('-m', '--model_dir', default=None,
                   help='local model dir (overrides --language)')
    p.add_argument('-t', '--show_tokens_info', action='store_true')
    p.add_argument('--align', action='store_true',
                   help='force-align audio against --label')
    p.add_argument('--label', type=str, default=None)
    p.add_argument('--beam', type=int, default=5)
    p.add_argument('--context_path', type=str, default=None)
    p.add_argument('--context_score', type=float, default=6.0)
    p.add_argument('--mode', default='ctc_prefix_beam_search')
    p.add_argument('--paraformer', action='store_true',
                   help='use the NAR Ali-Paraformer runtime '
                        '(cli/paraformer_model.py)')
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from reverb_tpu.cli.reverb import load_model

    if args.paraformer:
        # transcribe.py:66-70 — the paraformer branch returns a result dict
        from reverb_tpu.cli.paraformer_model import \
            load_model as load_paraformer
        model = load_paraformer(args.model_dir)
        result = model.transcribe(args.audio_file,
                                  tokens_info=args.show_tokens_info)
        print(json.dumps(result, ensure_ascii=False))
        return result

    if args.model_dir:
        model = load_model(args.model_dir)
    else:
        from reverb_tpu.cli.hub import Hub
        model = load_model(Hub.get_model_by_lang(args.language))

    if args.align:
        assert args.label, '--align needs --label'
        result = align(model, args.audio_file, args.label)
        print(json.dumps(result, ensure_ascii=False))
        return result

    kwargs = {}
    if args.context_path:
        from reverb_tpu.decode.context_graph import ContextGraph
        kwargs['context_graph'] = ContextGraph(
            context_list_path=args.context_path, tokenizer=model.tokenizer,
            context_score=args.context_score)
    res = model.transcribe_modes(args.audio_file, [args.mode],
                                 format='ctm' if args.show_tokens_info
                                 else 'txt',
                                 beam_size=args.beam, **kwargs)[0]
    print(res)
    return res


def align(model, audio_file: str, label: str):
    """model.align (cli/model.py:130-158): CTC forced alignment of `label`,
    returns token-level timestamps."""
    import numpy as np

    from reverb_tpu.decode.api import encode_and_ctc
    from reverb_tpu.decode.ctc_utils import (force_align, gen_ctc_peak_time,
                                             gen_timestamps_from_peak)
    import jax.numpy as jnp
    feats = model.compute_feats(audio_file)                  # (T, M)
    cat = jnp.asarray([1.0, 0.0], jnp.float32)
    _, enc_lens, ctc_probs = encode_and_ctc(
        model.params, model.model_config, jnp.asarray(feats[None]),
        jnp.asarray([feats.shape[0]]), cat)
    tokens, ids = model.tokenizer.tokenize(label)
    T = int(np.asarray(enc_lens)[0])
    ali = force_align(np.asarray(ctc_probs[0][:T]), ids,
                      model.model_config.blank_id)
    peaks = gen_ctc_peak_time(ali)
    frame_s = 0.04  # 4x subsampled 10 ms frames
    times = gen_timestamps_from_peak(peaks, max_duration=T * frame_s,
                                     frame_rate=frame_s)
    return {'text': label,
            'tokens': [{'token': t, 'start': round(s, 3),
                        'end': round(e, 3)}
                       for t, (s, e) in zip(tokens, times)]}


if __name__ == '__main__':
    main()
