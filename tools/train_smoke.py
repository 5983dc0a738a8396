"""Learning-loop smoke: prove the framework LEARNS, end to end.

Builds a synthetic tone-word corpus whose transcription is deterministically
learnable from scratch (each vocabulary word is a pure tone at a distinct
frequency), trains a tiny conformer through the real `reverb-train`
entrypoint for real epochs — with CV, mid-epoch snapshots, and a *mid-run
checkpoint resume* — then decodes the held-out set through the `reverb` CLI
(`cli/recognize_wav.py`) and scores the CTMs with the built-in WER harness
(`eval/wer.py`).  This closes the data → train → checkpoint → decode → WER
loop that is the reference's de-facto quality gate
(asr/wer_evaluation/scoring_commands.py:95-120, RESULTS.md golden numbers):
a silent bug in the loss wiring, data pipeline, optimizer, scheduler,
checkpointing, or decode stack fails this where random-weight parity tests
cannot.

Prints one JSON line per decode mode: {"mode", "wer", "errors", "ref_words"}
plus a learning-curve line, and exits non-zero if the final WER exceeds
--max_wer.

Usage:
    python tools/train_smoke.py                    # defaults, ~1-3 min
    python tools/train_smoke.py --epochs 30 --n_train 300
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
import wave as wave_mod
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# 8 tone-words: single sentencepiece pieces (word = one token), frequencies
# log-spaced well inside the 80-mel range so the mapping is separable
WORDS = ['bay', 'dee', 'fox', 'gum', 'hil', 'jak', 'lun', 'mor']
FREQS = [300.0 * (2.0 ** (i / 2.2)) for i in range(len(WORDS))]  # 300..2700 Hz
SR = 16000
TONE_S = 0.28
GAP_S = 0.12


def synth_wave(word_ids, rng: np.random.RandomState) -> np.ndarray:
    """Utterance = silence-separated tones, one per word, light noise."""
    gap = np.zeros(int(GAP_S * SR), np.float32)
    parts = [gap]
    n = int(TONE_S * SR)
    t = np.arange(n) / SR
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / 200.0)
    for w in word_ids:
        tone = np.sin(2 * np.pi * FREQS[w] * t).astype(np.float32) * env
        parts += [tone * 0.6, gap]
    x = np.concatenate(parts)
    x = x + rng.randn(len(x)).astype(np.float32) * 0.002
    return np.clip(x, -1, 1)


def write_wav(path, x: np.ndarray):
    with wave_mod.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((x * 32000).astype(np.int16).tobytes())


def make_corpus(root: Path, n_train: int, n_cv: int, seed: int = 0):
    """Write WAVs + raw jsonl lists; returns (train_list, cv_list, cv_refs)."""
    rng = np.random.RandomState(seed)
    root.mkdir(parents=True, exist_ok=True)
    (root / 'wav').mkdir(exist_ok=True)

    def gen(prefix, n, collect_refs=False):
        lines, refs = [], {}
        for i in range(n):
            ids = rng.randint(0, len(WORDS),
                              size=rng.randint(2, 7)).tolist()
            txt = ' '.join(WORDS[w] for w in ids)
            key = f'{prefix}{i:04d}'
            wav = root / 'wav' / f'{key}.wav'
            write_wav(wav, synth_wave(ids, rng))
            lines.append(json.dumps({'key': key, 'wav': str(wav),
                                     'txt': txt, 'style': 'verbatim'}))
            if collect_refs:
                refs[key] = txt
        return lines, refs

    train_lines, _ = gen('tr', n_train)
    cv_lines, cv_refs = gen('cv', n_cv, collect_refs=True)
    train_list = root / 'train.list'
    train_list.write_text('\n'.join(train_lines) + '\n')
    cv_list = root / 'cv.list'
    cv_list.write_text('\n'.join(cv_lines) + '\n')
    return train_list, cv_list, cv_refs


def make_exp(root: Path, train_list: Path, batch_size: int,
             enc_blocks: int, enc_dim: int, device_feats: bool = False,
             remat: bool = False, pad_len_multiple: int = 0) -> Path:
    """Tokenizer files (sp model: one piece per word), CMVN stats computed
    from the actual corpus, and a reference-schema config.yaml."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tests'))
    from helpers import write_sp_model  # minimal sp ModelProto writer

    root.mkdir(parents=True, exist_ok=True)
    pieces = [('<blank>', 0.0, 3), ('<unk>', 0.0, 2)]
    pieces += [(f'▁{w}', -float(i + 1), 1) for i, w in enumerate(WORDS)]
    pieces += [('<sos/eos>', 0.0, 3)]
    write_sp_model(root / 'tk.model', pieces, model_type=1)
    symbols = [p for p, _, _ in pieces]
    (root / 'tk.units.txt').write_text(
        ''.join(f'{s} {i}\n' for i, s in enumerate(symbols)))

    # global CMVN from the real training audio (utils/cmvn.py parity: stats
    # accumulated over frames)
    from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank
    fc = FbankConfig(num_mel_bins=80, dither=0.0)
    mean_stat = np.zeros(80, np.float64)
    var_stat = np.zeros(80, np.float64)
    frames = 0
    for line in train_list.read_text().splitlines()[:24]:
        obj = json.loads(line)
        with wave_mod.open(obj['wav'], 'rb') as w:
            x = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        feats = np.asarray(compute_fbank(
            np.asarray(x, np.float32), fc))
        mean_stat += feats.sum(0)
        var_stat += (feats ** 2).sum(0)
        frames += feats.shape[0]
    with open(root / 'global_cmvn', 'w') as f:
        json.dump({'mean_stat': mean_stat.tolist(),
                   'var_stat': var_stat.tolist(),
                   'frame_num': frames}, f)

    config = {
        'input_dim': 80,
        'output_dim': len(symbols),
        'cmvn': 'global_cmvn',
        'cmvn_conf': {'cmvn_file': str(root / 'global_cmvn'),
                      'is_json_cmvn': True},
        'tokenizer': 'rev_bpe',
        'tokenizer_conf': {'symbol_table_path': str(root / 'tk.units.txt'),
                           'bpe_path': str(root / 'tk.model'),
                           'non_lang_syms_path': None,
                           'remove_sw': True,
                           'replace_unk_as_unknown': True},
        'encoder': 'conformer',
        'encoder_conf': {
            'output_size': enc_dim, 'attention_heads': 2,
            'linear_units': enc_dim * 2, 'num_blocks': enc_blocks,
            'dropout_rate': 0.1, 'positional_dropout_rate': 0.1,
            'attention_dropout_rate': 0.0,
            'input_layer': 'conv2d', 'pos_enc_layer_type': 'rel_pos',
            'selfattention_layer_type': 'rel_selfattn',
            'activation_type': 'swish', 'macaron_style': True,
            'use_cnn_module': True, 'cnn_module_kernel': 15,
            'cnn_module_norm': 'batch_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': enc_dim * 2,
                         'num_blocks': 1, 'r_num_blocks': 1,
                         'dropout_rate': 0.1},
        'model': 'asr_model',
        'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3,
                       'lsm_weight': 0.1, 'length_normalized_loss': False},
        'ctc_conf': {'ctc_blank_id': 0},
        'dataset_conf': {
            'fbank_conf': {'num_mel_bins': 80, 'frame_length': 25,
                           'frame_shift': 10, 'dither': 0.1},
            'filter_conf': {'max_length': 4000, 'min_length': 5},
            'spec_aug': True,
            'spec_aug_conf': {'num_t_mask': 1, 'num_f_mask': 1,
                              'max_t': 8, 'max_f': 4},
            'shuffle': True, 'shuffle_conf': {'shuffle_size': 512},
            'sort': False,
            'pass_cat_emb': True,
            'cat_emb_conf': {'field': 'style', 'emb_len': 2,
                             'one_hot_ids': {'verbatim': 0,
                                             'nonverbatim': 1}},
            'batch_conf': {'batch_type': 'static',
                           'batch_size': batch_size,
                           **({'pad_len_multiple': pad_len_multiple}
                              if pad_len_multiple else {})}},
        'optim': 'adam',
        'optim_conf': {'lr': 2e-3},
        'scheduler': 'warmuplr',
        'scheduler_conf': {'warmup_steps': 80},
        'accum_grad': 1, 'grad_clip': 50.0,
        'log_interval': 20,
        'snapshot_saving_conf': {'save_interval': 0},
    }
    if device_feats:
        # fbank + SpecAugment on device inside the compiled step
        # (frontend/device_feats.py) — the TPU-pod training default
        config['dataset_conf']['device_feats'] = True
    if remat:
        config['encoder_conf'].update(gradient_checkpointing=True,
                                      remat_policy='dots')
        config['decoder_conf'].update(gradient_checkpointing=True,
                                      remat_policy='dots')
    with open(root / 'config.yaml', 'w') as f:
        yaml.safe_dump(config, f)
    return root / 'config.yaml'


def run_training(cfg_path: Path, train_list: Path, cv_list: Path,
                 model_dir: Path, epochs: int):
    """Train via the real entrypoint, interrupting at the midpoint and
    resuming from the snapshot — checkpoint/resume is part of the loop
    being proven (utils/checkpoint.py / executor.py parity)."""
    from reverb_tpu.bin.train import main as train_main
    base = ['--config', str(cfg_path), '--train_data', str(train_list),
            '--cv_data', str(cv_list), '--model_dir', str(model_dir),
            '--log_interval', '20']
    mid = max(1, epochs // 2)
    train_main(base + ['--max_epoch', str(mid)])
    assert (model_dir / f'epoch_{mid - 1}.npz').exists()
    train_main(base + ['--max_epoch', str(epochs),
                       '--checkpoint', str(model_dir / f'epoch_{mid - 1}.npz')])

    curve = []
    for e in range(epochs):
        y = model_dir / f'epoch_{e}.yaml'
        if y.exists():
            with open(y) as f:
                info = yaml.safe_load(f)
            curve.append((e, float(info.get('cv_loss', float('nan')))))
    return curve


def build_serve_dir(exp: Path, model_dir: Path, serve: Path,
                    epochs: int, avg_num: int = 3) -> Path:
    """Average the best-N checkpoints by CV loss (bin/average_model.py) into
    a CLI-loadable model directory."""
    from reverb_tpu.bin.average_model import main as avg_main
    serve.mkdir(parents=True, exist_ok=True)
    for name in ('config.yaml', 'tk.units.txt', 'tk.model', 'global_cmvn'):
        shutil.copy(exp / name, serve / name)
    avg_main(['--dst_model', str(serve / 'model.npz'),
              '--src_path', str(model_dir),
              '--num', str(min(avg_num, epochs)), '--val_best'])
    return serve


def decode_and_score(serve: Path, cv_list: Path, cv_refs, result_dir: Path,
                     modes):
    """Decode every held-out file through the CLI, score CTMs with the
    built-in WER harness; returns {mode: (wer, errors, ref_words)}."""
    from reverb_tpu.cli.recognize_wav import main as rec_main
    from reverb_tpu.eval.wer import WERAggregator, score_pair

    result_dir.mkdir(parents=True, exist_ok=True)
    for line in cv_list.read_text().splitlines():
        obj = json.loads(line)
        rec_main(['--audio_file', obj['wav'], '--model', str(serve),
                  '--result_dir', str(result_dir),
                  '--modes', *modes, '--beam_size', '6',
                  '--chunk_size', '512'])
    out = {}
    for mode in modes:
        agg = WERAggregator()
        for key, ref in cv_refs.items():
            ctm = result_dir / mode / f'{key}.ctm'
            hyp = ' '.join(
                ln.split()[4] for ln in ctm.read_text().splitlines()
                if len(ln.split()) >= 5) if ctm.exists() else ''
            agg.update(score_pair(ref, hyp)['wer']['bestWER'])
        out[mode] = (agg.wer(), agg.num_errors, agg.reference_count)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default=None)
    p.add_argument('--n_train', type=int, default=200)
    p.add_argument('--n_cv', type=int, default=16)
    p.add_argument('--epochs', type=int, default=20)
    p.add_argument('--batch_size', type=int, default=16)
    p.add_argument('--enc_blocks', type=int, default=2)
    p.add_argument('--enc_dim', type=int, default=64)
    p.add_argument('--max_wer', type=float, default=0.02)
    p.add_argument('--modes', nargs='+',
                   default=['ctc_greedy_search', 'ctc_prefix_beam_search',
                            'attention_rescoring'])
    p.add_argument('--device_feats', action='store_true',
                   help='fbank+SpecAug on device inside the train step')
    p.add_argument('--remat', action='store_true',
                   help="per-layer checkpointing, 'dots' policy")
    p.add_argument('--pad_len_multiple', type=int, default=0,
                   help='round padded batch lengths up (bounds the number '
                        'of distinct compiled shapes on TPU)')
    args = p.parse_args(argv)

    import tempfile
    work = Path(args.workdir) if args.workdir else \
        Path(tempfile.mkdtemp(prefix='reverb_smoke_'))
    work.mkdir(parents=True, exist_ok=True)

    train_list, cv_list, cv_refs = make_corpus(
        work / 'corpus', args.n_train, args.n_cv)
    cfg = make_exp(work / 'exp', train_list, args.batch_size,
                   args.enc_blocks, args.enc_dim,
                   device_feats=args.device_feats, remat=args.remat,
                   pad_len_multiple=args.pad_len_multiple)
    curve = run_training(cfg, train_list, cv_list, work / 'ckpts',
                         args.epochs)
    print(json.dumps({'learning_curve': [
        {'epoch': e, 'cv_loss': round(l, 4)} for e, l in curve]}))
    assert curve[-1][1] < curve[0][1], \
        f'CV loss did not decrease: {curve[0]} -> {curve[-1]}'

    serve = build_serve_dir(work / 'exp', work / 'ckpts', work / 'serve',
                            args.epochs)
    scores = decode_and_score(serve, cv_list, cv_refs, work / 'results',
                              args.modes)
    worst = 0.0
    for mode, (wer, errs, refw) in scores.items():
        print(json.dumps({'mode': mode, 'wer': round(wer, 4),
                          'errors': errs, 'ref_words': refw}))
        worst = max(worst, wer)
    if worst > args.max_wer:
        print(json.dumps({'verdict': 'FAIL', 'worst_wer': worst,
                          'max_wer': args.max_wer}))
        return 1
    print(json.dumps({'verdict': 'PASS', 'worst_wer': worst}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
