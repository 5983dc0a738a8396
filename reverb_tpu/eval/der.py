"""Diarization Error Rate (hermetic md-eval analogue).

The reference scores diarization with WDER only (its README quality table;
diarization/assign_words2speakers.py feeds fstalign) — DER is the standard
community metric (NIST md-eval / pyannote.metrics) and the diar bench
reports both.  Semantics follow md-eval:

  DER = (missed speech + false alarm + speaker confusion) / total ref speech

scored per time unit with overlapping speech counted per-speaker
(a 2-speaker overlap contributes 2 units of reference), an optimal
one-to-one reference↔hypothesis speaker mapping (Hungarian on overlap
time), and an optional no-score collar of ±collar seconds around every
reference segment boundary.

Implementation: a uniform grid at `resolution` seconds (default 10 ms —
md-eval's own time quantum).  Exact to the grid; hermetic (no scipy
dependency: Hungarian falls back to exact permutation search for <= 10
speakers, greedy beyond).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple


def _grid_matrix(segs, speakers, t_end: float, res: float):
    import numpy as np
    T = int(round(t_end / res)) + 1
    idx = {s: i for i, s in enumerate(speakers)}
    m = np.zeros((T, len(speakers)), bool)
    for (a, b, s) in segs:
        fa, fb = int(round(a / res)), int(round(b / res))
        m[fa:fb, idx[s]] = True
    return m


def _assignment(cost):
    """Max-overlap one-to-one mapping. cost[i, j] = overlap(ref i, hyp j).
    Exact for small matrices (permutations over the smaller side), greedy
    otherwise."""
    import numpy as np
    R, H = cost.shape
    if min(R, H) == 0:
        return []
    if min(R, H) <= 10:
        # exact: permute the smaller side over subsets of the larger
        if R <= H:
            best, best_pairs = -1.0, []
            for cols in itertools.permutations(range(H), R):
                v = sum(cost[i, c] for i, c in enumerate(cols))
                if v > best:
                    best, best_pairs = v, list(enumerate(cols))
            return best_pairs
        pairs = _assignment(cost.T)
        return [(i, j) for j, i in pairs]
    order = np.dstack(np.unravel_index(
        np.argsort(-cost, axis=None), cost.shape))[0]
    used_r, used_h, pairs = set(), set(), []
    for i, j in order:
        if i in used_r or j in used_h or cost[i, j] <= 0:
            continue
        pairs.append((int(i), int(j)))
        used_r.add(int(i))
        used_h.add(int(j))
    return pairs


def der(ref: Sequence[Tuple[float, float, str]],
        hyp: Sequence[Tuple[float, float, str]],
        collar: float = 0.25, resolution: float = 0.01) -> Dict[str, float]:
    """ref/hyp: (start_s, end_s, speaker) triples.  Returns
    {'der','miss','false_alarm','confusion','total_s'} (rates are fractions
    of total reference speech; total_s is scored reference speech
    seconds)."""
    import numpy as np
    if not ref:
        return {'der': 0.0 if not hyp else float('inf'), 'miss': 0.0,
                'false_alarm': 0.0, 'confusion': 0.0, 'total_s': 0.0}
    t_end = max([b for (_, b, _) in ref] + [b for (_, b, _) in hyp] + [0.0])
    r_spk = sorted({s for (_, _, s) in ref})
    h_spk = sorted({s for (_, _, s) in hyp})
    R = _grid_matrix(ref, r_spk, t_end, resolution)
    H = (_grid_matrix(hyp, h_spk, t_end, resolution) if hyp
         else np.zeros((R.shape[0], 0), bool))

    score = np.ones((R.shape[0],), bool)
    if collar > 0:
        c = int(round(collar / resolution))
        for (a, b, _) in ref:
            fa, fb = int(round(a / resolution)), int(round(b / resolution))
            score[max(fa - c, 0):fa + c] = False
            score[max(fb - c, 0):fb + c] = False
    R = R[score]
    H = H[score]

    # optimal mapping on overlap time inside the scored region
    cost = (R[:, :, None] & H[:, None, :]).sum(0).astype(np.float64)
    pairs = _assignment(cost)
    correct = np.zeros((R.shape[0],), np.int64)
    for i, j in pairs:
        correct += (R[:, i] & H[:, j])

    n_ref = R.sum(1).astype(np.int64)
    n_hyp = H.sum(1).astype(np.int64)
    miss = np.maximum(n_ref - n_hyp, 0).sum()
    fa = np.maximum(n_hyp - n_ref, 0).sum()
    conf = (np.minimum(n_ref, n_hyp) - correct).clip(min=0).sum()
    total = n_ref.sum()
    if total == 0:
        z = float('inf') if (fa or conf) else 0.0
        return {'der': z, 'miss': 0.0, 'false_alarm': z, 'confusion': 0.0,
                'total_s': 0.0}
    return {
        'der': float((miss + fa + conf) / total),
        'miss': float(miss / total),
        'false_alarm': float(fa / total),
        'confusion': float(conf / total),
        'total_s': float(total * resolution),
    }
