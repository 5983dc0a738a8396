"""Pretrained model hub.

Parity: asr/wenet/cli/hub.py:86-116 — download + cache pretrained models by
language/name (tarballs or git repos); zero-egress environments simply use
local paths via `load_model(path)`.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from pathlib import Path

CACHE_DIR = Path(os.environ.get('REVERB_TPU_HOME',
                                Path.home() / '.cache/reverb_tpu'))

# language → model tarball (wenet hub layout); reverb models are git repos
ASSETS = {
    'chinese': 'https://wenet.org.cn/downloads?models=wenet&version='
               'wenetspeech_u2pp_conformer_libtorch.tar.gz',
    'english': 'https://wenet.org.cn/downloads?models=wenet&version='
               'gigaspeech_u2pp_conformer_libtorch.tar.gz',
    'reverb_asr_v1': 'https://huggingface.co/Revai/reverb-asr',
}


class Hub:
    @staticmethod
    def get_model_by_lang(lang: str) -> str:
        if lang not in ASSETS:
            raise ValueError(
                f'unknown model {lang!r}; available: {sorted(ASSETS)}')
        url = ASSETS[lang]
        dest = CACHE_DIR / lang
        if dest.exists() and any(dest.iterdir()):
            return str(dest)
        dest.mkdir(parents=True, exist_ok=True)
        if url.endswith('.tar.gz') or 'tar.gz' in url:
            tar_path = dest / 'model.tar.gz'
            urllib.request.urlretrieve(url, tar_path)
            with tarfile.open(tar_path) as tf:
                tf.extractall(dest)
            tar_path.unlink()
        else:
            import subprocess
            subprocess.run(['git', 'clone', url, str(dest)], check=True)
        return str(dest)
