"""Sequence ops vs torch oracles: PE table + single-row quirk, banded
enc-dec mask, reflect/replicate audio padding, and
F.interpolate(linear, align_corners=False) resampling."""

import math

import numpy as np
import torch
import torch.nn.functional as F

from msmd_tpu.ops.seq import (
    alignment_mask,
    apply_pe_single_row,
    enc_dec_mask,
    linear_interpolate,
    pad_audio,
    sinusoidal_table,
)


def torch_pe_table(d_model, max_len):
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return pe


def test_sinusoidal_table_matches_torch():
    table = sinusoidal_table(64, 600)
    oracle = torch_pe_table(64, 600)
    np.testing.assert_allclose(np.asarray(table), oracle.numpy(), atol=3e-5)


def test_pe_single_row_quirk():
    # The reference adds pe[:, seq_len, :] (one row, broadcast) rather than
    # the first seq_len rows: reference utils/model_common.py:100.
    table = sinusoidal_table(16, 600)
    x = np.zeros((2, 7, 16), np.float32)
    out = np.asarray(apply_pe_single_row(x, table))
    expected = np.broadcast_to(np.asarray(table)[7], (2, 7, 16))
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_enc_dec_mask_matches_reference_semantics():
    # Direct oracle of the loop at utils/model_common.py:103-107.
    for T, S, fw, exp in [(5, 10, 2, 0), (8, 8, 1, 0), (6, 6, 1, 2)]:
        oracle = np.ones((T, S), bool)
        for i in range(T):
            oracle[i, max(0, (i - exp) * fw) : (i + exp + 1) * fw] = False
        got = np.asarray(enc_dec_mask(T, S, fw, exp))
        np.testing.assert_array_equal(got, oracle)


def test_alignment_mask_person_row():
    m = np.asarray(alignment_mask(n_prev_motions=3, n_motions=4, align_mask_width=1))
    assert m.shape == (8, 7)
    assert not m[0].any()  # person token row unmasked
    # band of width 1 below
    assert not m[1, 0] and m[1, 1:].all()


def test_pad_audio_matches_torch():
    def torch_pad_audio(audio, audio_unit=320, pad_threshold=80):
        _, audio_len = audio.shape
        n_units = audio_len // audio_unit
        side_len = math.ceil((audio_unit * n_units + pad_threshold - audio_len) / 2)
        if side_len >= 0:
            reflect_len = side_len // 2
            replicate_len = side_len % 2
            if reflect_len > 0:
                audio = F.pad(audio, (reflect_len, reflect_len), mode="reflect")
                audio = F.pad(audio, (reflect_len, reflect_len), mode="reflect")
            if replicate_len > 0:
                audio = F.pad(audio.unsqueeze(1), (1, 1), mode="replicate").squeeze(1)
        return audio

    for L in [64000, 63990, 16043, 321]:
        x = torch.randn(2, L)
        oracle = torch_pad_audio(x.clone())
        got = np.asarray(pad_audio(x.numpy()))
        assert got.shape == tuple(oracle.shape)
        np.testing.assert_allclose(got, oracle.numpy(), atol=1e-6)


def test_linear_interpolate_matches_torch():
    for L_in, L_out in [(400, 200), (200, 100), (333, 200), (100, 250), (7, 7)]:
        x = torch.randn(2, 8, L_in)
        oracle = F.interpolate(x, size=L_out, mode="linear", align_corners=False)
        got = np.asarray(linear_interpolate(x.numpy(), L_out))
        np.testing.assert_allclose(got, oracle.numpy(), rtol=1e-4, atol=1e-5)
