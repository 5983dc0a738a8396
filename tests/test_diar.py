"""Diarization: models, clustering, pipeline e2e, word assignment, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.diar.assign import (IntervalIndex, assign_words_to_speakers,
                                    speaker_for_segment)
from reverb_tpu.diar.models import (EmbeddingConfig, SegmentationConfig,
                                    embedding_forward, init_embedding_model,
                                    init_segmentation, powerset_classes,
                                    powerset_to_multilabel,
                                    segmentation_forward)
from reverb_tpu.diar.pipeline import (Diarizer, DiarizationConfig, Segment,
                                      agglomerative_cluster, binarize,
                                      merge_segments, write_rttm, load_rttm)

SEG_CFG = SegmentationConfig(sinc_filters=16, lstm_hidden=16, lstm_layers=1,
                             linear_dim=16)
EMB_CFG = EmbeddingConfig(feat_dim=80, channels=32, embed_dim=16, layers=2)


def test_powerset():
    classes = powerset_classes(3, 2)
    assert len(classes) == 7
    probs = jnp.zeros((1, 7)).at[0, 4].set(1.0)   # class {0,1}
    ml = np.asarray(powerset_to_multilabel(probs, 3, 2))
    assert classes[4] == (0, 1)
    np.testing.assert_allclose(ml[0], [1, 1, 0])


def test_segmentation_forward_shapes():
    params = init_segmentation(jax.random.PRNGKey(0), SEG_CFG)
    wave = jnp.asarray(np.random.RandomState(0).randn(2, 16000) * 0.1,
                       jnp.float32)
    logp = segmentation_forward(params, wave, SEG_CFG)
    assert logp.shape[0] == 2 and logp.shape[2] == 7
    assert np.allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, atol=1e-4)


def test_embedding_forward():
    params = init_embedding_model(jax.random.PRNGKey(0), EMB_CFG)
    feats = jnp.asarray(np.random.RandomState(0).randn(3, 50, 80),
                        jnp.float32)
    emb = embedding_forward(params, feats, jnp.array([50, 30, 10]), EMB_CFG)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               atol=1e-4)


def test_clustering_separates():
    rng = np.random.RandomState(0)
    a = rng.randn(8) + np.array([5] + [0] * 7)
    b = rng.randn(8) + np.array([0] * 7 + [5])
    embs = np.stack([a + 0.1 * rng.randn(8) for _ in range(3)]
                    + [b + 0.1 * rng.randn(8) for _ in range(3)])
    embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    labels = agglomerative_cluster(embs, threshold=0.5)
    assert len(set(labels[:3])) == 1
    assert len(set(labels[3:])) == 1
    assert labels[0] != labels[3]


def test_binarize_hysteresis():
    cfg = DiarizationConfig(onset=0.5, offset=0.4, min_duration_on=0.0,
                            min_duration_off=0.05)
    act = np.array([0.1, 0.6, 0.7, 0.45, 0.3, 0.1, 0.8, 0.8, 0.1])
    segs = binarize(act, 0.1, cfg)
    assert len(segs) == 2
    assert abs(segs[0][0] - 0.1) < 1e-6


def test_diarizer_end_to_end():
    seg_params = init_segmentation(jax.random.PRNGKey(0), SEG_CFG)
    emb_params = init_embedding_model(jax.random.PRNGKey(1), EMB_CFG)
    diar = Diarizer(seg_params, emb_params, SEG_CFG, EMB_CFG,
                    DiarizationConfig(window_sec=2.0, step_sec=1.0,
                                      onset=0.1, offset=0.08))
    wave = (np.random.RandomState(0).randn(16000 * 3) * 0.1).astype(
        np.float32)
    segs = diar(wave, 16000)
    for s in segs:
        assert s.end > s.start >= 0


def test_rttm_roundtrip_and_assign(tmp_path):
    segs = [Segment(0.0, 2.0, 'SPEAKER_00'), Segment(2.0, 4.0, 'SPEAKER_01'),
            Segment(5.0, 6.0, 'SPEAKER_00')]
    rttm_path = tmp_path / 'x.rttm'
    with open(rttm_path, 'w') as f:
        write_rttm(f, segs, 'fileA')
    loaded = load_rttm(rttm_path)
    assert list(loaded) == ['fileA']
    assert len(loaded['fileA']) == 3

    idx = IntervalIndex(segs)
    assert speaker_for_segment(0.5, 0.5, idx) == 'SPEAKER_00'
    assert speaker_for_segment(1.8, 0.5, idx) == 'SPEAKER_01'  # majority
    assert speaker_for_segment(4.2, 0.3, idx) == 'SPEAKER_01'  # nearest

    ctm_path = tmp_path / 'x.ctm'
    ctm_path.write_text('fileA 0 0.50 0.30 hello 1.00\n'
                        'fileA 0 2.50 0.30 world 1.00\n')
    stm_path = tmp_path / 'x.stm'
    assign_words_to_speakers(rttm_path, ctm_path, stm_path)
    lines = stm_path.read_text().splitlines()
    assert lines[0].split()[2] == 'SPEAKER_00'
    assert lines[1].split()[2] == 'SPEAKER_01'
    assert lines[0].split()[5] == 'hello'


def test_segmentation_training_decreases_loss():
    from reverb_tpu.diar.train_segmentation import (segmentation_loss,
                                                    train_segmentation)
    rng = np.random.RandomState(0)
    params = init_segmentation(jax.random.PRNGKey(0), SEG_CFG)
    wave = rng.randn(2, 8000).astype(np.float32) * 0.1
    # labels: all silence (class 0)
    logp = segmentation_forward(params, jnp.asarray(wave), SEG_CFG)
    T = logp.shape[1]
    labels = np.zeros((2, T, 7), np.float32)
    labels[:, :, 0] = 1.0

    def batches():
        yield wave, labels

    l0, _ = segmentation_loss(params, jnp.asarray(wave), jnp.asarray(labels),
                              SEG_CFG)
    trained = train_segmentation(params, batches, cfg=SEG_CFG, lr=1e-3,
                                 max_epochs=5, patience=10)
    l1, _ = segmentation_loss(trained, jnp.asarray(wave),
                              jnp.asarray(labels), SEG_CFG)
    assert float(l1) < float(l0)


def _ahc_oracle(embeddings, threshold, max_clusters=8):
    """Reference average-linkage AHC: literal re-averaging of member lists
    (the pre-round-4 formulation) — oracle for the Lance-Williams rewrite."""
    n = len(embeddings)
    clusters = [[i] for i in range(n)]
    sims = embeddings @ embeddings.T
    while len(clusters) > 1:
        best, best_sim = None, -2.0
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                s = np.mean([sims[a, b] for a in clusters[i]
                             for b in clusters[j]])
                if s > best_sim:
                    best_sim, best = s, (i, j)
        if best_sim < 1.0 - threshold and len(clusters) <= max_clusters:
            break
        i, j = best
        clusters[i] += clusters[j]
        del clusters[j]
    labels = np.zeros((n,), np.int32)
    for ci, members in enumerate(clusters):
        for m in members:
            labels[m] = ci
    return labels


def test_ahc_matches_bruteforce_oracle():
    rng = np.random.RandomState(0)
    for trial, (n, thr) in enumerate([(12, 0.5), (25, 0.7), (40, 0.3)]):
        centers = rng.randn(4, 8)
        embs = centers[rng.randint(4, size=n)] + rng.randn(n, 8) * 0.3
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        got = agglomerative_cluster(embs, thr)
        want = _ahc_oracle(embs, thr)
        # same PARTITION (labels are arbitrary ids): co-membership equality
        np.testing.assert_array_equal(got[:, None] == got[None, :],
                                      want[:, None] == want[None, :],
                                      err_msg=f'trial {trial}')


def test_ahc_tied_similarities_valid_partition():
    """Documented accepted divergence (diar/pipeline.py tie-break note):
    with exactly-tied similarities the vectorized Lance-Williams AHC may
    pick a different merge than the cluster-list-order oracle.  The result
    must still be a VALID partition: within-threshold cohesion — every
    point shares a cluster with its nearest neighbor when that pair is
    above the merge threshold — and identical cluster-size multiset when
    the geometry forces it (duplicated points)."""
    # degenerate: 3 identical groups of duplicated points — all
    # within-group sims are exactly 1.0, all cross-group sims exactly tied
    base = np.eye(3)
    embs = np.repeat(base, 4, axis=0)          # 12 points, 3 exact groups
    got = agglomerative_cluster(embs, threshold=0.5)
    want = _ahc_oracle(embs, threshold=0.5)
    # same partition despite ties here (duplicates force the grouping)
    np.testing.assert_array_equal(got[:, None] == got[None, :],
                                  want[:, None] == want[None, :])
    # tied-but-distinct: two pairs with identical pairwise sims; either
    # merge order is valid — assert a valid 2-cluster partition, not a
    # specific labeling
    v = np.array([[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0]], np.float64)
    got = agglomerative_cluster(v, threshold=0.5)
    sizes = sorted(np.bincount(got).tolist())
    assert sizes == [2, 2]
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]


def test_pipeline_tiling_invariance():
    """Tiled static-shape batching (seg 64-row / emb 128-row tiles, bucketed
    T) must not change pipeline output: run the same audio with tiny forced
    tiles vs one big tile and compare segments exactly."""
    seg_params = init_segmentation(jax.random.PRNGKey(0), SEG_CFG)
    emb_params = init_embedding_model(jax.random.PRNGKey(1), EMB_CFG)
    rng = np.random.RandomState(0)
    sr = 16000
    wave = (rng.randn(sr * 45) * 0.05).astype(np.float32)
    wave[sr * 5:sr * 15] += np.sin(
        2 * np.pi * 440 * np.arange(sr * 10) / sr).astype(np.float32) * 0.3
    cfg = DiarizationConfig(onset=0.3, offset=0.25)
    outs = []
    for seg_tile, emb_tile in [(2, 2), (64, 128)]:
        diar = Diarizer(seg_params, emb_params, SEG_CFG, EMB_CFG, cfg)
        diar.SEG_TILE = seg_tile
        diar.EMB_TILE = emb_tile
        outs.append(diar(wave, sr))
    a, b = outs
    assert len(a) == len(b)
    for sa, sb in zip(a, b):
        assert sa.speaker == sb.speaker
        assert abs(sa.start - sb.start) < 1e-6
        assert abs(sa.end - sb.end) < 1e-6


def test_embedding_training_separates_speakers():
    """After brief cosine-softmax training, embeddings cluster by speaker
    (random-init nets map everything to cosine≈1 — the measured failure the
    trainer exists to fix)."""
    from reverb_tpu.diar.train_embedding import train_embedding
    rng = np.random.RandomState(0)
    T, F, n_spk = 32, 80, 3

    def spk_feats(s, n):
        base = np.zeros((F,), np.float32)
        base[10 + 20 * s:20 + 20 * s] = 4.0        # distinct band per spk
        return (base[None, None, :]
                + rng.randn(n, T, F).astype(np.float32) * 0.5)

    def batches():
        for _ in range(4):
            ys = rng.randint(n_spk, size=12)
            feats = np.concatenate([spk_feats(s, 1) for s in ys])
            yield feats, np.full((12,), T), ys

    params = init_embedding_model(jax.random.PRNGKey(2), EMB_CFG)
    trained = train_embedding(params, n_spk, batches, EMB_CFG,
                              lr=3e-3, max_epochs=10)
    test_y = np.repeat(np.arange(n_spk), 6)
    test_f = np.concatenate([spk_feats(s, 6) for s in range(n_spk)])
    embs = np.asarray(embedding_forward(
        trained, jnp.asarray(test_f), jnp.full((len(test_y),), T), EMB_CFG))
    sims = embs @ embs.T
    same = test_y[:, None] == test_y[None, :]
    off = ~np.eye(len(test_y), dtype=bool)
    within = sims[same & off].mean()
    between = sims[~same].mean()
    assert within > between + 0.2, (within, between)
    labels = agglomerative_cluster(embs, threshold=1.0 - (within + between) / 2)
    # clustering at the midpoint threshold recovers the speaker partition
    np.testing.assert_array_equal(labels[:, None] == labels[None, :],
                                  same)


def test_binarize_binary_matches_hysteresis():
    """The np.diff fast path must reproduce `binarize` exactly on binary
    activity curves (hysteresis degenerates to thresholding there),
    including min_duration_on filtering, min_duration_off gap merging,
    and active-at-array-end runs."""
    from reverb_tpu.diar.pipeline import (DiarizationConfig, binarize,
                                          binarize_binary)
    rng = np.random.RandomState(0)
    cfg = DiarizationConfig()
    frame_sec = 0.0169
    for trial in range(50):
        # blocky random curves with runs of mixed lengths
        n = rng.randint(5, 400)
        runs = rng.randint(1, 40, size=32)
        vals = (np.arange(32) % 2).astype(np.float32)
        if rng.rand() < 0.5:
            vals = 1 - vals
        act = np.repeat(vals, runs)[:n]
        want = binarize(act, frame_sec, cfg)
        got = binarize_binary(act, frame_sec, cfg)
        assert len(want) == len(got), (trial, want, got)
        for (a, b), (c, d) in zip(want, got):
            assert abs(a - c) < 1e-9 and abs(b - d) < 1e-9, (trial,)
