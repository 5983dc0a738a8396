"""reverb_tpu — a TPU-native (JAX/XLA/Pallas) speech recognition + diarization framework.

Capability target: revdotcom/reverb (WeNet-style joint CTC/attention conformer ASR with
verbatimicity conditioning, five decode modes, word timestamps, diarization, training
runtime). Public API mirrors the reference: ``load_model(...)`` returns a ``ReverbASR``
with ``.transcribe(...)`` / ``.transcribe_modes(...)``
(reference: asr/wenet/__init__.py:1-6, asr/wenet/cli/reverb.py:40-357).
"""

__version__ = "0.1.0"


def load_model(model: str, **kwargs):
    """Load a Reverb ASR model (lazy import to keep `import reverb_tpu` light)."""
    from reverb_tpu.cli.reverb import load_model as _load_model
    return _load_model(model, **kwargs)


def init_model(configs, rng=None, cmvn=None):
    """Config-registry model construction (utils/init_model.py parity)."""
    from reverb_tpu.models.registry import init_model as _init_model
    return _init_model(configs, rng=rng, cmvn=cmvn)


def __getattr__(name):
    if name == "ReverbASR":
        from reverb_tpu.cli.reverb import ReverbASR
        return ReverbASR
    raise AttributeError(f"module 'reverb_tpu' has no attribute {name!r}")
