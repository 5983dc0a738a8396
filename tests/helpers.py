"""Test helpers: tiny sentencepiece model writer, tiny model dir builder,
synthetic WAVs."""

import json
import struct
import wave as wave_mod

import numpy as np
import yaml


def _varint(n: int) -> bytes:
    out = b''
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(field_no: int, wire: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | wire) + payload


def _len_field(field_no: int, payload: bytes) -> bytes:
    return _field(field_no, 2, _varint(len(payload)) + payload)


def write_sp_model(path, pieces, model_type=1):
    """Write a minimal sentencepiece ModelProto.

    pieces: list of (piece, score, type) — type 1=normal 2=unk 3=control.
    """
    buf = b''
    for piece, score, ptype in pieces:
        sp = _len_field(1, piece.encode('utf-8'))
        sp += _field(2, 5, struct.pack('<f', score))
        if ptype != 1:
            sp += _field(3, 0, _varint(ptype))
        buf += _len_field(1, sp)
    trainer = _field(3, 0, _varint(model_type))
    buf += _len_field(2, trainer)
    with open(path, 'wb') as f:
        f.write(buf)


TINY_PIECES = [
    ('<blank>', 0.0, 3),
    ('<unk>', 0.0, 2),
    ('▁a', -1.0, 1),
    ('▁b', -1.5, 1),
    ('▁ab', -2.5, 1),
    ('c', -2.0, 1),
    ('▁', -3.0, 1),
    ('a', -3.5, 1),
    ('b', -3.6, 1),
    ('<sos/eos>', 0.0, 3),
]


def build_tiny_model_dir(tmpdir, num_blocks=2, dec_blocks=2, r_blocks=1):
    """Create config.yaml + random npz checkpoint + tokenizer files."""
    import jax
    from reverb_tpu.convert.torch_ckpt import save_npz
    from reverb_tpu.models.asr_model import ModelConfig, init_params

    import os
    d = tmpdir
    os.makedirs(d, exist_ok=True)
    # symbol table maps sp pieces to model ids
    symbols = [p for p, _, _ in TINY_PIECES]
    with open(d / 'tk.units.txt', 'w') as f:
        for i, s in enumerate(symbols):
            f.write(f'{s} {i}\n')
    write_sp_model(d / 'tk.model', TINY_PIECES, model_type=1)
    # cmvn stats
    M = 80
    cmvn = {'mean_stat': list(np.zeros(M)), 'var_stat': list(np.ones(M) * 100),
            'frame_num': 100}
    with open(d / 'global_cmvn', 'w') as f:
        json.dump(cmvn, f)

    config = {
        'input_dim': M,
        'cmvn': 'global_cmvn',
        'cmvn_conf': {'cmvn_file': 'global_cmvn', 'is_json_cmvn': True},
        'tokenizer': 'rev_bpe',
        'tokenizer_conf': {'symbol_table_path': 'tk.units.txt',
                           'bpe_path': 'tk.model',
                           'non_lang_syms_path': None,
                           'remove_sw': True,
                           'replace_unk_as_unknown': True},
        'encoder': 'conformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': num_blocks, 'dropout_rate': 0.1,
            'positional_dropout_rate': 0.1, 'attention_dropout_rate': 0.0,
            'input_layer': 'conv2d', 'pos_enc_layer_type': 'rel_pos',
            'selfattention_layer_type': 'rel_selfattn',
            'activation_type': 'swish', 'macaron_style': True,
            'use_cnn_module': True, 'cnn_module_kernel': 15,
            'cnn_module_norm': 'batch_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': dec_blocks, 'r_num_blocks': r_blocks,
                         'dropout_rate': 0.1},
        'model': 'asr_model',
        'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3,
                       'lsm_weight': 0.1, 'length_normalized_loss': False},
        'ctc_conf': {'ctc_blank_id': 0},
        'dataset_conf': {
            'fbank_conf': {'num_mel_bins': M, 'frame_length': 25,
                           'frame_shift': 10, 'dither': 0.1},
            'pass_cat_emb': True,
            'cat_emb_conf': {'field': 'style', 'emb_len': 2,
                             'one_hot_ids': {'v': 0, 'nv': 1}},
            'batch_conf': {'batch_type': 'static', 'batch_size': 2}},
        'output_dim': len(symbols),
    }
    with open(d / 'config.yaml', 'w') as f:
        yaml.safe_dump(config, f)

    cfg = ModelConfig.from_config(config)
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_npz(d / 'model.npz', params)
    return d


def write_wav(path, seconds=1.0, sr=16000, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 8000).astype(np.int16)
    with wave_mod.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return path
