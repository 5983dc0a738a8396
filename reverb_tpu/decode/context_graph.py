"""Context biasing via an Aho-Corasick trie with fail arcs.

Parity: asr/wenet/utils/context_graph.py — context phrases are tokenized
(`tokenize` :24-57) into a trie; during search each emitted token advances a
per-hypothesis graph state earning `context_score` per matched token, with
fail-arc fallback and a `finalize` backoff for partial matches (:103-142).

Integration note (documented divergence): the reference adds the bonus
inside the python CTC prefix-beam loop (search.py:169-218).  The device-side
scan search here applies biasing as an exact nbest re-ranking pass instead
(`rescore_nbest`): each nbest hypothesis is walked through the graph and its
total score adjusted — identical scores for hypotheses that survive the
beam; phrases pruned *inside* the beam are not resurrected (same tradeoff as
shallow-fusion-after-beam).  In-loop device biasing is a planned follow-up
(per-step bonus table lookup in the scan).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple


class ContextState:
    __slots__ = ('id', 'token', 'token_score', 'node_score',
                 'output_score', 'is_end', 'next', 'fail', 'output')

    def __init__(self, sid: int, token: int, token_score: float,
                 node_score: float, output_score: float, is_end: bool):
        self.id = sid
        self.token = token
        self.token_score = token_score
        self.node_score = node_score
        self.output_score = output_score
        self.is_end = is_end
        self.next: Dict[int, 'ContextState'] = {}
        self.fail: Optional['ContextState'] = None
        self.output: Optional['ContextState'] = None


class ContextGraph:
    def __init__(self, context_list_path: Optional[str] = None,
                 symbol_table: Optional[Dict[str, int]] = None,
                 bpe_model: Optional[str] = None,
                 context_score: float = 6.0,
                 context_list: Optional[List[str]] = None,
                 tokenizer=None):
        self.context_score = context_score
        self.num_nodes = 0
        self.root = ContextState(0, -1, 0.0, 0.0, 0.0, False)
        self.root.fail = self.root
        token_ids = self._tokenize(context_list_path, context_list,
                                   symbol_table, bpe_model, tokenizer)
        self.build(token_ids)

    def _tokenize(self, path, context_list, symbol_table, bpe_model,
                  tokenizer) -> List[List[int]]:
        """context_graph.py:24-57: phrases → token id lists."""
        phrases = list(context_list or [])
        if path:
            with open(path, encoding='utf8') as f:
                phrases += [ln.strip() for ln in f if ln.strip()]
        out = []
        for phrase in phrases:
            if tokenizer is not None:
                _, ids = tokenizer.tokenize(phrase)
            elif bpe_model is not None:
                from reverb_tpu.text.sentencepiece_model import \
                    SentencePieceModel
                sp = SentencePieceModel(bpe_model)
                pieces = sp.encode(phrase, out_type=str)
                ids = [symbol_table[p] for p in pieces if p in symbol_table]
            else:
                assert symbol_table is not None
                ids = [symbol_table[ch] for ch in phrase.replace(' ', '▁')
                       if ch in symbol_table]
            if ids:
                out.append(ids)
        return out

    def build(self, token_ids: List[List[int]]):
        """Trie + BFS fail/output arcs (context_graph.py:59-142)."""
        for ids in token_ids:
            node = self.root
            for i, tok in enumerate(ids):
                if tok not in node.next:
                    self.num_nodes += 1
                    is_end = i == len(ids) - 1
                    node_score = node.node_score + self.context_score
                    node.next[tok] = ContextState(
                        self.num_nodes, tok, self.context_score, node_score,
                        node_score if is_end else 0.0, is_end)
                node = node.next[tok]
            node.is_end = True
            node.output_score = node.node_score
        # fail arcs
        queue = deque()
        for tok, node in self.root.next.items():
            node.fail = self.root
            queue.append(node)
        while queue:
            cur = queue.popleft()
            for tok, node in cur.next.items():
                fail = cur.fail
                while tok not in fail.next and fail is not self.root:
                    fail = fail.fail
                node.fail = fail.next.get(tok, self.root)
                if node.fail is node:
                    node.fail = self.root
                node.output = (node.fail if node.fail.is_end
                               else node.fail.output)
                queue.append(node)

    def forward_one_step(self, state: ContextState, token: int
                         ) -> Tuple[float, ContextState]:
        """Returns (score delta, next state)."""
        if token in state.next:
            nxt = state.next[token]
            score = nxt.token_score
        else:
            node = state.fail
            while token not in node.next and node is not self.root:
                node = node.fail
            if token in node.next:
                nxt = node.next[token]
            else:
                nxt = self.root
            score = nxt.node_score - state.node_score
        out_score = nxt.output.output_score if nxt.output else 0.0
        return score + out_score, nxt

    def finalize(self, state: ContextState) -> Tuple[float, ContextState]:
        """Backoff partial matches at utterance end (context_graph.py:131+)."""
        return -state.node_score if not state.is_end else 0.0, self.root

    # ----------------------- nbest integration -----------------------

    def score_sequence(self, tokens: List[int]) -> float:
        state = self.root
        total = 0.0
        for tok in tokens:
            delta, state = self.forward_one_step(state, tok)
            total += delta
        backoff, _ = self.finalize(state)
        return total + backoff

    def rescore_nbest(self, results):
        """Re-rank each DecodeResult's nbest by adding context scores."""
        from reverb_tpu.decode.results import DecodeResult
        out = []
        for res in results:
            if not res.nbest:
                out.append(res)
                continue
            scored = []
            for i, hyp in enumerate(res.nbest):
                bonus = self.score_sequence(hyp)
                scored.append((res.nbest_scores[i] + bonus, i))
            scored.sort(reverse=True)
            order = [i for _, i in scored]
            out.append(DecodeResult(
                tokens=res.nbest[order[0]],
                score=scored[0][0],
                times=res.nbest_times[order[0]] if res.nbest_times else None,
                nbest=[res.nbest[i] for i in order],
                nbest_scores=[s for s, _ in scored],
                nbest_times=[res.nbest_times[i] for i in order]
                if res.nbest_times else None))
        return out
