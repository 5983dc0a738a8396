"""Speaker diarization pipeline: sliding-window segmentation → per-window
speaker embeddings → agglomerative clustering → stitched global annotation →
RTTM.

Capability parity with the pyannote pipeline wrapped by
diarization/infer_pyannote3.0.py:33-42 (inside pyannote: local segmentation,
embedding, clustering, stitching — SURVEY.md §2.10).  Batched TPU design:
all windows of a file run as ONE jitted segmentation batch and one embedding
batch; only clustering/stitching stay on host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.diar.models import (EmbeddingConfig, SegmentationConfig,
                                    embedding_forward, init_embedding_model,
                                    powerset_to_multilabel,
                                    segmentation_forward,
                                    segmentation_frame_rate)
from reverb_tpu.frontend.fbank import (FbankConfig, compute_fbank,
                                        fbank_numpy, num_frames)


@dataclasses.dataclass
class DiarizationConfig:
    window_sec: float = 10.0
    step_sec: float = 5.0
    onset: float = 0.5           # speaker-activity binarization threshold
    offset: float = 0.45
    min_duration_on: float = 0.25
    min_duration_off: float = 0.2
    clustering_threshold: float = 0.7    # cosine distance for AHC merge
    min_cluster_size: int = 1
    max_speakers: int = 8


@dataclasses.dataclass
class Segment:
    start: float
    end: float
    speaker: str


def sliding_windows(n_samples: int, sr: int, cfg: DiarizationConfig
                    ) -> List[Tuple[int, int]]:
    win = int(cfg.window_sec * sr)
    step = int(cfg.step_sec * sr)
    if n_samples <= win:
        return [(0, win)]
    starts = list(range(0, n_samples - win + 1, step))
    if starts[-1] + win < n_samples:
        starts.append(n_samples - win)
    return [(s, s + win) for s in starts]


def binarize(activity: np.ndarray, frame_sec: float, cfg: DiarizationConfig
             ) -> List[Tuple[float, float]]:
    """Hysteresis-threshold a per-frame activity curve → (start, end) list."""
    segs = []
    active = False
    start = 0.0
    for t, a in enumerate(activity):
        if not active and a >= cfg.onset:
            active = True
            start = t * frame_sec
        elif active and a < cfg.offset:
            active = False
            end = t * frame_sec
            if end - start >= cfg.min_duration_on:
                segs.append((start, end))
    if active:
        end = len(activity) * frame_sec
        if end - start >= cfg.min_duration_on:
            segs.append((start, end))
    # merge gaps shorter than min_duration_off
    merged = []
    for s in segs:
        if merged and s[0] - merged[-1][1] < cfg.min_duration_off:
            merged[-1] = (merged[-1][0], s[1])
        else:
            merged.append(list(s))
    return [(a, b) for a, b in merged]


def binarize_binary(activity: np.ndarray, frame_sec: float,
                    cfg: DiarizationConfig) -> List[Tuple[float, float]]:
    """`binarize` fast path for BINARY (0/1) activity curves — hysteresis
    degenerates to thresholding, so runs come from np.diff instead of a
    per-frame python loop (the loop cost 3.6 s on the 30-min bench).
    Output order/semantics identical to `binarize`: min_duration_on filter
    at segment close, THEN min_duration_off gap merge."""
    a = activity.astype(bool)
    if not a.any():
        return []
    d = np.diff(a.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if a[0]:
        starts = np.concatenate([[0], starts])
    if a[-1]:
        ends = np.concatenate([ends, [len(a)]])
    segs = [(s * frame_sec, e * frame_sec)
            for s, e in zip(starts, ends)
            if (e - s) * frame_sec >= cfg.min_duration_on]
    merged: List[List[float]] = []
    for s in segs:
        if merged and s[0] - merged[-1][1] < cfg.min_duration_off:
            merged[-1][1] = s[1]
        else:
            merged.append(list(s))
    return [(x, y) for x, y in merged]


def agglomerative_cluster(embeddings: np.ndarray, threshold: float,
                          max_clusters: int = 8) -> np.ndarray:
    """Average-linkage AHC on cosine distance (host-side).

    Vectorized Lance-Williams: the cluster-level average-linkage similarity
    S[a,b] = mean pairwise sim between members updates exactly as
    S[a∪b, k] = (n_a·S[a,k] + n_b·S[b,k]) / (n_a + n_b), so each merge is
    two numpy row ops instead of re-averaging member lists (the previous
    python-loop formulation cost ~20 min at N≈370 on the 30-min diar bench;
    this runs in milliseconds).

    Tie-break note: the best pair comes from np.argmax's flat order over
    ORIGINAL-index rows, while the pre-vectorization formulation scanned
    cluster-list order; with exactly-tied or near-threshold similarities the
    two can pick different (equally-valid) merges and produce a different
    valid partition.  Accepted divergence — the brute-force oracle test
    pins equality on non-degenerate inputs and documents ties separately
    (test_diar.py::test_ahc_tied_similarities_valid_partition)."""
    n = len(embeddings)
    if n == 0:
        return np.zeros((0,), np.int32)
    S = (embeddings @ embeddings.T).astype(np.float64)
    np.fill_diagonal(S, -np.inf)
    alive = np.ones(n, bool)
    sizes = np.ones(n)
    members: List[List[int]] = [[i] for i in range(n)]
    n_alive = n
    while n_alive > 1:
        i, j = np.unravel_index(int(np.argmax(S)), S.shape)
        best_sim = S[i, j]
        if best_sim < 1.0 - threshold and n_alive <= max_clusters:
            break
        i, j = min(i, j), max(i, j)
        na, nb = sizes[i], sizes[j]
        row = (na * S[i, :] + nb * S[j, :]) / (na + nb)
        S[i, :] = row
        S[:, i] = row
        S[i, i] = -np.inf
        S[j, :] = -np.inf                 # retire j
        S[:, j] = -np.inf
        alive[j] = False
        sizes[i] = na + nb
        members[i] += members[j]
        n_alive -= 1
    labels = np.zeros((n,), np.int32)
    ci = 0
    for idx in range(n):
        if alive[idx]:
            for m in members[idx]:
                labels[m] = ci
            ci += 1
    return labels


class Diarizer:
    """End-to-end diarization over one audio file."""

    def __init__(self, seg_params, emb_params,
                 seg_cfg: SegmentationConfig = SegmentationConfig(),
                 emb_cfg: EmbeddingConfig = EmbeddingConfig(),
                 cfg: DiarizationConfig = DiarizationConfig(),
                 seg_forward=None, emb_forward=None, frame_sec=None,
                 emb_feat_dim=None):
        """seg_forward(p, wave (B,Tw)) → (B,T',C) powerset LOG-probs and
        emb_forward(p, feats (B,T,F), lens) → (B,E) override the native
        models (e.g. the pyannote/wespeaker-compatible family in
        diar/pyannet.py — see `from_pyannote_checkpoints`); frame_sec is the
        seconds-per-output-frame of the override segmentation net."""
        self.seg_params = seg_params
        self.emb_params = emb_params
        self.seg_cfg = seg_cfg
        self.emb_cfg = emb_cfg
        self.cfg = cfg
        self._frame_sec = frame_sec
        self._emb_feat_dim = emb_feat_dim or emb_cfg.feat_dim
        seg_fn = seg_forward or (
            lambda p, w: segmentation_forward(p, w, seg_cfg))
        emb_fn = emb_forward or (
            lambda p, f, l: embedding_forward(p, f, l, emb_cfg))
        # fetch per-speaker ACTIVITY as uint8, not (W,T',C) f32 posteriors:
        # every host byte costs real wall time on a remote-TPU link
        # (measured: the f32 posterior fetch was ~40% of the segmentation
        # phase on the 30-min bench)
        self._seg_fn = jax.jit(lambda p, w: powerset_to_multilabel(
            jnp.exp(seg_fn(p, w)), seg_cfg.max_speakers,
            seg_cfg.max_simultaneous).astype(jnp.uint8))
        self._emb_fn = jax.jit(emb_fn)

        # wave-resident gathers: window batches / segment crops slice the
        # device-resident wave instead of shipping padded batches from the
        # host (jit keys carry the BUCKETED wave length — see __call__)
        def _seg_from_wave(p, wave_dev, starts, win_len):
            rows = jax.vmap(lambda s: jax.lax.dynamic_slice(
                wave_dev, (s,), (win_len,)))(starts)
            return powerset_to_multilabel(
                jnp.exp(seg_fn(p, rows)), seg_cfg.max_speakers,
                seg_cfg.max_simultaneous).astype(jnp.uint8)
        self._seg_from_wave = jax.jit(_seg_from_wave, static_argnums=(3,))

    @classmethod
    def from_pyannote_checkpoints(cls, segmentation_ckpt: str,
                                  embedding_ckpt: str = None,
                                  cfg: DiarizationConfig = None):
        """Build a Diarizer from released pyannote-format checkpoints: a
        PyanNet segmentation .ckpt/.bin (e.g. Revai/reverb-diarization-v1/2)
        and optionally a wespeaker ResNet34 embedding .pt — the stack behind
        diarization/infer_pyannote3.0.py:33-42."""
        import torch
        from reverb_tpu.diar.pyannet import (PyanNetConfig,
                                             convert_wespeaker_resnet34,
                                             load_pyannet_checkpoint,
                                             pyannet_forward,
                                             resnet34_forward)
        seg_params = load_pyannet_checkpoint(segmentation_ckpt)
        pcfg = PyanNetConfig()
        if embedding_ckpt:
            state = torch.load(embedding_ckpt, map_location='cpu',
                               weights_only=False)
            state = state.get('state_dict', state) if isinstance(state, dict)\
                else state
            emb_params = convert_wespeaker_resnet34(
                {k: (v.numpy() if hasattr(v, 'numpy') else v)
                 for k, v in state.items()})
            emb_fwd = lambda p, f, l: resnet34_forward(p, f, l)  # noqa: E731
            emb_feat_dim = 80
        else:   # fall back to the native embedding net
            emb_params = None
            emb_fwd = None
            emb_feat_dim = None
        if emb_params is None:
            emb_params = init_embedding_model(jax.random.PRNGKey(0))
        return cls(seg_params, emb_params,
                   cfg=cfg or DiarizationConfig(),
                   seg_forward=lambda p, w: pyannet_forward(p, w, pcfg),
                   emb_forward=emb_fwd,
                   frame_sec=pcfg.frame_stride / pcfg.sample_rate,
                   emb_feat_dim=emb_feat_dim)

    # Static-shape tiling (TPU: every distinct batch shape is a separate XLA
    # compile — over the remote link minutes each).  Window batches run as
    # fixed tiles (shorter files bucket to the next power of two), so any
    # audio length reuses the same compiled programs.  SEG_TILE=256 (round
    # 5, was 64): the BiLSTM scan is latency-bound per CALL, not per row —
    # 6 calls of 64 windows cost ~6x one call of 384 (measured 6.7 s →
    # ~1.2 s on the 30-min bench), so fewer, fatter tiles win.
    SEG_TILE = 512
    EMB_TILE = 128

    def warm_buckets(self, sr: int = 16000,
                     buckets=(64, 128, 256, 512, 1024)):
        """Pre-compile the bucketed fbank/embedding shapes a long file can
        hit: segment-length buckets are data-dependent (the longest speech
        segment picks buck_T), so without this a new bucket compiles INSIDE
        the serving path (measured: 15.4 s of the 30-min bench's 26 s wall
        was first-bucket compiles)."""
        fb_cfg = FbankConfig(sample_rate=sr,
                             num_mel_bins=self._emb_feat_dim)
        for bt in buckets:
            samp = (bt - 1) * fb_cfg.window_shift + fb_cfg.window_size
            f = self._fbank_batch(jnp.zeros((self.EMB_TILE, samp)),
                                  fb_cfg, bt)
            self._emb_fn(self.emb_params, jnp.zeros(
                (self.EMB_TILE, bt, self._emb_feat_dim)),
                jnp.ones((self.EMB_TILE,), jnp.int32))
            jax.block_until_ready(f)

    @staticmethod
    def _tile_rows(n: int, cap: int) -> int:
        if n >= cap:
            return cap
        t = 1
        while t < n:
            t *= 2
        return t

    def __call__(self, wave: np.ndarray, sr: int = 16000) -> List[Segment]:
        """Diarize one file.  Per-phase wall times land in
        `self.last_phases` (ms) — the diar analogue of the ASR bench's
        runs_phases."""
        import time as _time
        cfg = self.cfg
        ph = {}
        t_start = _time.perf_counter()
        windows = sliding_windows(len(wave), sr, cfg)
        win_len = windows[0][1] - windows[0][0]
        n_win = len(windows)
        tile = self._tile_rows(n_win, self.SEG_TILE)
        n_pad = -n_win % tile
        # the WAVE ships to the device ONCE; window batches and segment
        # crops are device-side gathers (the padded (W, win_len) f32 window
        # batch alone was a ~230 MB host->device upload on the 30-min
        # bench — ~40% of its wall over the remote link)
        wave_dev = self._bucket_wave(wave, sr)
        starts = np.full((n_win + n_pad,), len(wave), np.int32)
        starts[:n_win] = [s for (s, _) in windows]
        parts = [np.asarray(self._seg_from_wave(
            self.seg_params, wave_dev,
            jnp.asarray(starts[t:t + tile]), win_len))
                 for t in range(0, len(starts), tile)]
        activity = np.concatenate(parts)[:n_win]       # (W, T', S) uint8
        frame_sec = self._frame_sec or \
            segmentation_frame_rate(self.seg_cfg)
        t1 = _time.perf_counter()
        ph['segmentation_ms'] = round((t1 - t_start) * 1e3, 1)

        # local segments + their embeddings
        local: List[Tuple[float, float, int, int]] = []  # start,end,win,slot
        for w, (ws, _) in enumerate(windows):
            off = ws / sr
            for s_idx in range(activity.shape[2]):
                for a, b in binarize_binary(activity[w, :, s_idx],
                                            frame_sec, cfg):
                    local.append((off + a, off + b, w, s_idx))
        t2 = _time.perf_counter()
        ph['binarize_ms'] = round((t2 - t1) * 1e3, 1)
        if not local:
            self.last_phases = ph
            return []

        # segment fbank ON DEVICE, batched: the host-numpy per-segment loop
        # cost ~70% of the old pipeline wall (hundreds of python fbanks);
        # rows are raw segment waves padded to a bucketed sample length —
        # frames [0, n) read only samples [0, len), so padding zeros never
        # reach a valid frame, and stats pooling masks by true length
        fb_cfg = FbankConfig(sample_rate=sr,
                             num_mel_bins=self._emb_feat_dim)
        n_seg = len(local)
        seg_lens = [max(int(b * sr) - int(a * sr), fb_cfg.window_size)
                    for (a, b, _, _) in local]
        lens_f = [num_frames(n, fb_cfg) for n in seg_lens]
        max_T = max(lens_f)
        # bucket T to a power of two (≥64) and rows to fixed tiles: stats
        # pooling is length-masked and conv padding is zeros either way, so
        # bucketed padding is numerics-invariant while the compiled-shape
        # set stays small and reusable across files
        buck_T = 64
        while buck_T < max_T:
            buck_T *= 2
        samp_buck = (buck_T - 1) * fb_cfg.window_shift + fb_cfg.window_size
        tile = self._tile_rows(n_seg, self.EMB_TILE)
        n_pad = -n_seg % tile
        seg_starts = np.full((n_seg + n_pad,), len(wave), np.int32)
        lens = np.ones((n_seg + n_pad,), np.int32)
        for i, ((a, b, _, _), sl, lf) in enumerate(
                zip(local, seg_lens, lens_f)):
            seg_starts[i] = int(a * sr)
            lens[i] = max(lf, 1)
        # crops gather from the already-resident wave; rows past each
        # segment's true length hold trailing audio, but frames >= lens[i]
        # are masked by the embedding net's length-masked stats pooling —
        # same numerics as zero padding (pinned by tiling invariance).
        # Feeds the embedding net WITHOUT a host round trip (the old
        # upload+fetch+reupload cycle cost ~24 s of the 30-min bench)
        feats_dev = [self._fbank_from_wave(
            wave_dev, jnp.asarray(seg_starts[t:t + tile]), fb_cfg,
            samp_buck, buck_T)
            for t in range(0, len(seg_starts), tile)]
        jax.block_until_ready(feats_dev[-1])
        t3 = _time.perf_counter()
        ph['fbank_ms'] = round((t3 - t2) * 1e3, 1)

        embs = np.concatenate([
            np.asarray(self._emb_fn(self.emb_params, f,
                                    jnp.asarray(lens[i * tile:
                                                     (i + 1) * tile])))
            for i, f in enumerate(feats_dev)])[:n_seg]
        t4 = _time.perf_counter()
        ph['embedding_ms'] = round((t4 - t3) * 1e3, 1)

        labels = agglomerative_cluster(embs, cfg.clustering_threshold,
                                       cfg.max_speakers)
        segs = [Segment(a, b, f'SPEAKER_{labels[i]:02d}')
                for i, (a, b, _, _) in enumerate(local)]
        out = merge_segments(segs)
        t5 = _time.perf_counter()
        ph['cluster_stitch_ms'] = round((t5 - t4) * 1e3, 1)
        ph['total_ms'] = round((t5 - t_start) * 1e3, 1)
        self.last_phases = ph
        return out

    @staticmethod
    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _fbank_batch(waves, fb_cfg, n_frames: int):
        return jax.vmap(
            lambda w: compute_fbank(w, fb_cfg, n_frames=n_frames))(waves)

    @staticmethod
    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def _fbank_from_wave(wave_dev, starts, fb_cfg, samp: int,
                         n_frames: int):
        def one(s):
            w = jax.lax.dynamic_slice(wave_dev, (s,), (samp,)) * (1 << 15)
            return compute_fbank(w, fb_cfg, n_frames=n_frames)
        return jax.vmap(one)(starts)

    # wave lengths bucket to 256 s multiples (+1 slack chunk): the
    # device-resident wave's shape is part of every gather program's jit
    # key, so without bucketing each new file length recompiles the world
    WAVE_CHUNK_S = 256

    def _bucket_wave(self, wave: np.ndarray, sr: int):
        chunk = self.WAVE_CHUNK_S * sr
        bucket = (len(wave) // chunk + 2) * chunk
        wave_dev = jnp.asarray(np.ascontiguousarray(wave, np.float32))
        return jnp.pad(wave_dev, (0, bucket - len(wave)))


def merge_segments(segs: List[Segment], gap: float = 0.1) -> List[Segment]:
    """Stitch overlapping/adjacent same-speaker segments."""
    segs = sorted(segs, key=lambda s: (s.speaker, s.start))
    out: List[Segment] = []
    for s in segs:
        if out and out[-1].speaker == s.speaker and \
                s.start <= out[-1].end + gap:
            out[-1] = Segment(out[-1].start, max(out[-1].end, s.end),
                              s.speaker)
        else:
            out.append(s)
    return sorted(out, key=lambda s: s.start)


def write_rttm(f, segments: List[Segment], uri: str):
    """RTTM rows: SPEAKER <uri> 1 <start> <dur> <NA> <NA> <speaker> <NA> <NA>."""
    for s in segments:
        f.write(f'SPEAKER {uri} 1 {s.start:.3f} {s.end - s.start:.3f} '
                f'<NA> <NA> {s.speaker} <NA> <NA>\n')


def load_rttm(path) -> Dict[str, List[Segment]]:
    out: Dict[str, List[Segment]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 8 or parts[0] != 'SPEAKER':
                continue
            uri, start, dur, spk = parts[1], float(parts[3]), \
                float(parts[4]), parts[7]
            out.setdefault(uri, []).append(Segment(start, start + dur, spk))
    return out
