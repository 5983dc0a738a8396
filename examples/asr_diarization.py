"""Combined ASR + diarization workload (SURVEY.md §3.4, the WDER pipeline):

  1. diarize the file → RTTM speaker segments
  2. transcribe the file → CTM word timings
  3. assign words to speakers → STM
  4. (optional) score WDER against a reference STM

Usage:
  python examples/asr_diarization.py audio.wav \
      --asr_model ~/.cache/reverb/reverb_asr_v1 \
      --diar_model_dir diar_ckpts/ [--ref_stm ref.stm]
"""

import argparse
import sys
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('audio_file')
    p.add_argument('--asr_model', required=True,
                   help='model dir (config.yaml + ckpt) or hub name')
    p.add_argument('--diar_model_dir', default=None,
                   help='dir with segmentation.npz + embedding.npz '
                        '(random init if absent — smoke runs)')
    p.add_argument('--out_dir', default='asr_diar_out')
    p.add_argument('--verbatimicity', type=float, default=1.0)
    p.add_argument('--ref_stm', default=None)
    args = p.parse_args(argv)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    stem = Path(args.audio_file).stem

    # 1. diarization → RTTM (bin/infer_diarization CLI, §3.4 step 1)
    from reverb_tpu.bin import infer_diarization
    diar_argv = [args.audio_file, '--out-dir', str(out)]
    if args.diar_model_dir:
        diar_argv += ['--model-dir', args.diar_model_dir]
    infer_diarization.main(diar_argv)
    rttm_path = out / f'{stem}.rttm'
    print(f'wrote {rttm_path}', file=sys.stderr)

    # 2. ASR → CTM
    from reverb_tpu.cli.reverb import load_model
    model = load_model(args.asr_model)
    ctm = model.transcribe(args.audio_file, format='ctm',
                           verbatimicity=args.verbatimicity)
    ctm_path = out / f'{stem}.ctm'
    ctm_path.write_text(ctm if ctm.endswith('\n') else ctm + '\n')
    print(f'wrote {ctm_path}', file=sys.stderr)

    # 3. words × segments → STM
    from reverb_tpu.diar.assign import assign_words_to_speakers
    stm_path = out / f'{stem}.stm'
    assign_words_to_speakers(rttm_path, ctm_path, stm_path)
    print(f'wrote {stm_path}', file=sys.stderr)

    # 4. WDER
    if args.ref_stm:
        from reverb_tpu.eval.wder import read_stm_words, wder
        m = wder(read_stm_words(args.ref_stm), read_stm_words(stm_path))
        print('WDER %.4f over %d words' % (m['wder'], m['total']))


if __name__ == '__main__':
    main()
