"""Whisper tokenizer (parity: asr/wenet/text/whisper_tokenizer.py) — backed
by the transformers package (baked into the image); gated import."""

from __future__ import annotations

from typing import Dict, List, Tuple

from reverb_tpu.text.tokenizer import BaseTokenizer


class WhisperTokenizer(BaseTokenizer):
    def __init__(self, multilingual: bool = False, num_languages: int = 99,
                 language: str = 'en', task: str = 'transcribe'):
        self.multilingual = multilingual
        self.language = language
        self.task = task
        self._tok = None

    def _build(self):
        if self._tok is None:
            from transformers import WhisperTokenizer as _WT
            name = 'openai/whisper-tiny' if self.multilingual else \
                'openai/whisper-tiny.en'
            self._tok = _WT.from_pretrained(name, language=self.language,
                                            task=self.task)
        return self._tok

    def text2tokens(self, line: str) -> List[str]:
        return self._build().tokenize(line)

    def tokens2text(self, tokens: List[str]) -> str:
        t = self._build()
        return t.convert_tokens_to_string(tokens)

    def tokens2ids(self, tokens: List[str]) -> List[int]:
        return self._build().convert_tokens_to_ids(tokens)

    def ids2tokens(self, ids: List[int]) -> List[str]:
        return self._build().convert_ids_to_tokens(ids)

    def vocab_size(self) -> int:
        return len(self._build())

    @property
    def symbol_table(self) -> Dict[str, int]:
        return self._build().get_vocab()


class HuggingFaceTokenizer(BaseTokenizer):
    """Parity: asr/wenet/text/hugging_face_tokenizer.py — any AutoTokenizer."""

    def __init__(self, model: str):
        self.model = model
        self._tok = None

    def _build(self):
        if self._tok is None:
            from transformers import AutoTokenizer
            self._tok = AutoTokenizer.from_pretrained(self.model)
        return self._tok

    def text2tokens(self, line: str) -> List[str]:
        return self._build().tokenize(line)

    def tokens2text(self, tokens: List[str]) -> str:
        return self._build().convert_tokens_to_string(tokens)

    def tokens2ids(self, tokens: List[str]) -> List[int]:
        return self._build().convert_tokens_to_ids(tokens)

    def ids2tokens(self, ids: List[int]) -> List[str]:
        return self._build().convert_ids_to_tokens(ids)

    def vocab_size(self) -> int:
        return len(self._build())

    @property
    def symbol_table(self) -> Dict[str, int]:
        return self._build().get_vocab()
