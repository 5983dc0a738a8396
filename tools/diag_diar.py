"""Diarization quality diagnosis on the hardened (overlap + confusable
speaker) corpus: which stage fails?

  A. segmentation: frame-level speech recall/precision vs the oracle
     activity (any-speaker), plus overlap-frame recall (2-speaker frames).
  B. embeddings: intra- vs inter-speaker cosine statistics on oracle
     single-speaker crops from the EVAL corpus (the separation AHC needs).
  C. end-to-end DER through the pipeline.

Env knobs: REVERB_DIAR_EPOCHS / REVERB_DIAR_EMB_EPOCHS / REVERB_DIAR_SPK /
REVERB_DIAR_OVERLAP / REVERB_DIAR_THRESH (AHC cosine-distance threshold).
Prints one JSON line.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000


def main():
    from tools.bench_diar import make_corpus, powerset_labels
    from reverb_tpu.diar.models import (EmbeddingConfig, SegmentationConfig,
                                        embedding_forward,
                                        init_embedding_model,
                                        init_segmentation, powerset_classes,
                                        powerset_to_multilabel,
                                        segmentation_forward,
                                        segmentation_frame_rate)
    from reverb_tpu.diar.pipeline import Diarizer, DiarizationConfig
    from reverb_tpu.diar.train_embedding import train_embedding
    from reverb_tpu.diar.train_segmentation import train_segmentation
    from reverb_tpu.eval.der import der as der_fn
    from reverb_tpu.export.aot import maybe_enable_default_cache
    from reverb_tpu.frontend.fbank import FbankConfig, fbank_numpy
    maybe_enable_default_cache()

    on_tpu = jax.devices()[0].platform != 'cpu'
    n_spk = int(os.environ.get('REVERB_DIAR_SPK', '5'))
    overlap = float(os.environ.get('REVERB_DIAR_OVERLAP', '0.2'))
    thresh = float(os.environ.get('REVERB_DIAR_THRESH', '0.7'))
    minutes = float(os.environ.get('REVERB_DIAR_MIN', '6'))
    seg_cfg = SegmentationConfig() if on_tpu else SegmentationConfig(
        sinc_filters=16, lstm_hidden=16, lstm_layers=1, linear_dim=16)
    emb_cfg = EmbeddingConfig() if on_tpu else EmbeddingConfig(
        channels=32, embed_dim=32, layers=2)
    classes = powerset_classes(seg_cfg.max_speakers, seg_cfg.max_simultaneous)
    frame_sec = segmentation_frame_rate(seg_cfg)

    wave, oracle = make_corpus(minutes, n_spk, overlap_frac=overlap)
    train_wave, train_oracle = make_corpus(4.0, n_spk, seed=1,
                                           overlap_frac=overlap)

    # ---- train segmentation ----
    seg_params = init_segmentation(jax.random.PRNGKey(0), seg_cfg)
    win = int(5.0 * SR)
    from reverb_tpu.diar.models import segmentation_forward as segf
    n_frames = segf(seg_params, jnp.zeros((1, win)), seg_cfg).shape[1]

    def batches():
        rng = np.random.RandomState(2)
        starts = rng.randint(0, len(train_wave) - win,
                             size=int(os.environ.get('REVERB_DIAR_SEG_WINDOWS',
                                                     '64')))
        for i in range(0, len(starts), 8):
            ws = starts[i:i + 8]
            w = np.stack([train_wave[s:s + win] for s in ws])
            labs = np.stack([
                powerset_labels(train_oracle, n_spk, s / SR, (s + win) / SR,
                                frame_sec, n_frames, classes) for s in ws])
            yield jnp.asarray(w), jnp.asarray(labs)

    t0 = time.perf_counter()
    seg_params = train_segmentation(
        seg_params, batches, cfg=seg_cfg, lr=1e-3,
        max_epochs=int(os.environ.get('REVERB_DIAR_EPOCHS', '8')),
        patience=10)
    seg_train_s = time.perf_counter() - t0

    # train-vs-eval CE: same-distribution generalization check
    from reverb_tpu.diar.train_segmentation import segmentation_loss
    w0, l0 = next(iter(batches()))
    train_ce = float(segmentation_loss(seg_params, w0, l0, seg_cfg)[0])
    ev_starts = np.random.RandomState(9).randint(0, len(wave) - win, 8)
    ew = np.stack([wave[s:s + win] for s in ev_starts])
    el = np.stack([powerset_labels(oracle, n_spk, s / SR, (s + win) / SR,
                                   frame_sec, n_frames, classes)
                   for s in ev_starts])
    eval_ce = float(segmentation_loss(seg_params, jnp.asarray(ew),
                                      jnp.asarray(el), seg_cfg)[0])

    # ---- A: frame-level segmentation quality on the EVAL corpus ----
    # score 5 s windows tiled over the first `minutes` of eval audio
    starts = list(range(0, len(wave) - win, win))
    probs = []
    for i in range(0, len(starts), 16):
        w = np.stack([wave[s:s + win] for s in starts[i:i + 16]])
        probs.append(np.asarray(jnp.exp(segf(seg_params, jnp.asarray(w),
                                             seg_cfg))))
    probs = np.concatenate(probs)
    act = np.asarray(powerset_to_multilabel(
        jnp.asarray(probs), seg_cfg.max_speakers,
        seg_cfg.max_simultaneous))          # (W, T', S)
    pred_any = act.max(-1) > 0.5            # (W, T')
    pred_n = (act > 0.5).sum(-1)
    ref_any = np.zeros_like(pred_any)
    ref_n = np.zeros(pred_any.shape, np.int32)
    for wdx, s in enumerate(starts):
        t0s = s / SR
        for (a, b, _) in oracle:
            fa = int(max(0, (a - t0s) / frame_sec))
            fb = int(min(pred_any.shape[1],
                         np.ceil((b - t0s) / frame_sec)))
            if fb > fa and a < t0s + 5.0 and b > t0s:
                ref_any[wdx, fa:fb] = True
                ref_n[wdx, fa:fb] += 1
    speech_recall = float((pred_any & ref_any).sum() / max(ref_any.sum(), 1))
    speech_prec = float((pred_any & ref_any).sum() / max(pred_any.sum(), 1))
    ov = ref_n >= 2
    overlap_recall = float(((pred_n >= 2) & ov).sum() / max(ov.sum(), 1))

    # ---- train embeddings ----
    crop_s, crop = 2.0, int(2.0 * SR)
    fb = FbankConfig(sample_rate=SR, num_mel_bins=emb_cfg.feat_dim)

    def single_speaker_longs(oracle_segs):
        out = []
        for seg in oracle_segs:
            a, b, s = seg
            if b - a < crop_s + 0.1:
                continue
            if any(x[0] < b and a < x[1] and x is not seg
                   for x in oracle_segs):
                continue
            out.append(seg)
        return out

    def emb_batches():
        rng = np.random.RandomState(3)
        longs = single_speaker_longs(train_oracle)
        picks = [longs[rng.randint(len(longs))] for _ in range(
            int(os.environ.get('REVERB_DIAR_EMB_CROPS', '128')))]
        for i in range(0, len(picks), 16):
            fs, ys = [], []
            for (a, b, s) in picks[i:i + 16]:
                p0 = int(rng.uniform(a, b - crop_s) * SR)
                w = train_wave[p0:p0 + crop] * (1 << 15)
                fs.append(fbank_numpy(w.astype(np.float32), fb))
                ys.append(s)
            feats = np.stack(fs)
            yield (feats, np.full((len(fs),), feats.shape[1]), np.array(ys))

    emb_params = init_embedding_model(jax.random.PRNGKey(1), emb_cfg)
    t0 = time.perf_counter()
    emb_params = train_embedding(
        emb_params, n_spk, emb_batches, emb_cfg,
        max_epochs=int(os.environ.get('REVERB_DIAR_EMB_EPOCHS', '8')),
        margin=float(os.environ.get('REVERB_DIAR_EMB_MARGIN', '0.2')),
        scale=float(os.environ.get('REVERB_DIAR_EMB_SCALE', '30')))
    emb_train_s = time.perf_counter() - t0

    # ---- B: embedding separation on EVAL single-speaker crops ----
    rng = np.random.RandomState(5)
    longs = single_speaker_longs(oracle)
    crops, labels = [], []
    for _ in range(120):
        a, b, s = longs[rng.randint(len(longs))]
        p0 = int(rng.uniform(a, b - crop_s) * SR)
        w = wave[p0:p0 + crop] * (1 << 15)
        crops.append(fbank_numpy(w.astype(np.float32), fb))
        labels.append(s)
    feats = np.stack(crops)
    lens = np.full((len(crops),), feats.shape[1])
    embs = np.asarray(embedding_forward(
        emb_params, jnp.asarray(feats), jnp.asarray(lens), emb_cfg))
    embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    labels = np.array(labels)
    simm = embs @ embs.T
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(labels), 1)
    intra = simm[iu][same[iu]]
    inter = simm[iu][~same[iu]]

    # ---- C: end-to-end ----
    onset = float(os.environ.get('REVERB_DIAR_ONSET', '0.5'))
    offset = float(os.environ.get('REVERB_DIAR_OFFSET', '0.45'))
    ref_triples = [(a, b, f'REF_{s}') for (a, b, s) in oracle]
    sweep = {}
    best = None
    for th in (0.3, 0.4, 0.5, 0.6, thresh):
        diar = Diarizer(seg_params, emb_params, seg_cfg, emb_cfg,
                        DiarizationConfig(clustering_threshold=th,
                                          onset=onset, offset=offset))
        sg = diar(wave, SR)
        dd = der_fn(ref_triples, [(s.start, s.end, s.speaker) for s in sg],
                    collar=0.25)
        sweep[f't{th}'] = {'der': round(dd['der'], 4),
                           'spk': len({s.speaker for s in sg})}
        if best is None or dd['der'] < best[1]['der']:
            best = (th, dd, sg, diar)
    thresh, d, segs, diar = best

    if os.environ.get('REVERB_DIAR_SAVE'):
        flat = {}
        def _fl(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    _fl(v, f'{path}/{k}' if path else k)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    _fl(v, f'{path}/{i}')
            elif node is not None:
                flat[path] = np.asarray(node)
        _fl({'seg': seg_params, 'emb': emb_params}, '')
        np.savez(os.environ['REVERB_DIAR_SAVE'], **flat)

    print(json.dumps({
        'thresh_sweep': sweep, 'best_thresh': thresh,
        'train_ce': round(train_ce, 4), 'eval_ce': round(eval_ce, 4),
        'seg_train_s': round(seg_train_s, 1),
        'emb_train_s': round(emb_train_s, 1),
        'speech_recall': round(speech_recall, 3),
        'speech_precision': round(speech_prec, 3),
        'overlap_recall': round(overlap_recall, 3),
        'emb_intra_cos_mean': round(float(intra.mean()), 3),
        'emb_inter_cos_mean': round(float(inter.mean()), 3),
        'emb_inter_cos_p95': round(float(np.percentile(inter, 95)), 3),
        'der': round(d['der'], 4), 'miss': round(d['miss'], 4),
        'fa': round(d['false_alarm'], 4),
        'conf': round(d['confusion'], 4),
        'hyp_speakers': len({s.speaker for s in segs}),
        'phases_ms': getattr(diar, 'last_phases', None),
    }))


if __name__ == '__main__':
    main()
