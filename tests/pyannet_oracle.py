"""Test-only torch transliterations of pyannote.audio PyanNet and the
wespeaker ResNet34 speaker-embedding net (neither package is installable in
this environment), with the REAL checkpoint key names, used to round-trip
`reverb_tpu.diar.pyannet`'s converters on randomly-initialized weights.

Sources re-stated: pyannote.audio models/blocks/sincnet.py +
models/segmentation/PyanNet.py; asteroid_filterbanks param_sinc_fb.py
(cos/sin analytic pairs); wespeaker speaker_resnet.py (BasicBlock ResNet34,
temporal statistics pooling).
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class ParamSincFB(nn.Module):
    """asteroid_filterbanks.ParamSincFB(n_filters=80, kernel_size=251):
    40 (low, band) parameter pairs → interleaved cos/sin band-pass pairs."""

    def __init__(self, n_filters=80, kernel_size=251, stride=10,
                 sample_rate=16000, min_low_hz=50.0, min_band_hz=50.0):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz
        n_params = n_filters // 2
        low_hz, high_hz = 30.0, sample_rate / 2 - (min_low_hz + min_band_hz)

        def to_mel(hz):
            return 2595 * np.log10(1 + hz / 700)

        def to_hz(mel):
            return 700 * (10 ** (mel / 2595) - 1)

        mel = np.linspace(to_mel(low_hz), to_mel(high_hz), n_params + 1)
        hz = to_hz(mel)
        self.low_hz_ = nn.Parameter(
            torch.from_numpy(hz[:-1]).float().view(-1, 1))
        self.band_hz_ = nn.Parameter(
            torch.from_numpy(np.diff(hz)).float().view(-1, 1))
        half = kernel_size // 2
        self.register_buffer('window_', torch.from_numpy(
            np.hamming(kernel_size)[:half].astype(np.float32)))
        self.register_buffer('n_', 2 * math.pi * torch.arange(
            -half, 0).float() / sample_rate)

    def filters(self):
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(low + self.min_band_hz + torch.abs(self.band_hz_),
                           self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]
        ft_low = torch.matmul(low, self.n_.unsqueeze(0))
        ft_high = torch.matmul(high, self.n_.unsqueeze(0))
        cos_left = ((torch.sin(ft_high) - torch.sin(ft_low))
                    / (self.n_ / 2)) * self.window_
        cos_f = torch.cat([cos_left, 2 * band.view(-1, 1),
                           cos_left.flip(1)], dim=1) / (2 * band.view(-1, 1))
        sin_left = ((torch.cos(ft_low) - torch.cos(ft_high))
                    / (self.n_ / 2)) * self.window_
        sin_f = torch.cat([sin_left, torch.zeros_like(band).view(-1, 1),
                           -sin_left.flip(1)], dim=1) / (2 * band.view(-1, 1))
        return torch.stack([cos_f, sin_f], dim=1).view(
            -1, 1, self.kernel_size)

    def forward(self, x):
        return F.conv1d(x, self.filters(), stride=self.stride)


class _Encoder(nn.Module):
    def __init__(self, filterbank):
        super().__init__()
        self.filterbank = filterbank

    def forward(self, x):
        return self.filterbank(x)


class SincNet(nn.Module):
    """pyannote.audio models/blocks/sincnet.py."""

    def __init__(self, stride=10):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList([
            _Encoder(ParamSincFB(80, 251, stride=stride)),
            nn.Conv1d(80, 60, 5, stride=1),
            nn.Conv1d(60, 60, 5, stride=1)])
        self.pool1d = nn.ModuleList([nn.MaxPool1d(3, stride=3)
                                     for _ in range(3)])
        self.norm1d = nn.ModuleList([nn.InstanceNorm1d(c, affine=True)
                                     for c in (80, 60, 60)])

    def forward(self, waveforms):
        outputs = self.wav_norm1d(waveforms)
        for c, (conv1d, pool1d, norm1d) in enumerate(
                zip(self.conv1d, self.pool1d, self.norm1d)):
            outputs = conv1d(outputs)
            if c == 0:
                outputs = torch.abs(outputs)
            outputs = F.leaky_relu(norm1d(pool1d(outputs)))
        return outputs


class PyanNet(nn.Module):
    """pyannote/segmentation-3.0 geometry: 4-layer monolithic BiLSTM(128),
    2 linear layers, 7 powerset classes."""

    def __init__(self, num_classes=7, lstm_layers=4, hidden=128):
        super().__init__()
        self.sincnet = SincNet(stride=10)
        self.lstm = nn.LSTM(60, hidden, num_layers=lstm_layers,
                            bidirectional=True, batch_first=True)
        self.linear = nn.ModuleList([nn.Linear(2 * hidden, 128),
                                     nn.Linear(128, 128)])
        self.classifier = nn.Linear(128, num_classes)

    def forward(self, waveforms):
        outputs = self.sincnet(waveforms[:, None, :])
        outputs, _ = self.lstm(outputs.permute(0, 2, 1))
        for linear in self.linear:
            outputs = F.leaky_relu(linear(outputs))
        return F.log_softmax(self.classifier(outputs), dim=-1)


# --------------------- wespeaker ResNet34 ---------------------

class BasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or in_planes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(out + sc)


class ResNet34(nn.Module):
    """wespeaker speaker_resnet ResNet34 + temporal stats pooling."""

    def __init__(self, feat_dim=80, m_channels=32, embed_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        counts, planes = (3, 4, 6, 3), (m_channels, 2 * m_channels,
                                        4 * m_channels, 8 * m_channels)
        in_p = m_channels
        for si, (n, p) in enumerate(zip(counts, planes)):
            blocks = []
            for bi in range(n):
                stride = (1 if si == 0 else 2) if bi == 0 else 1
                blocks.append(BasicBlock(in_p, p, stride))
                in_p = p
            setattr(self, f'layer{si + 1}', nn.Sequential(*blocks))
        freq_out = feat_dim // 8          # three stride-2 stages
        self.seg_1 = nn.Linear(planes[-1] * freq_out * 2, embed_dim)

    def forward(self, feats):
        """feats (B, T, F) → (B, E)."""
        x = feats.permute(0, 2, 1).unsqueeze(1)      # (B,1,F,T)
        x = F.relu(self.bn1(self.conv1(x)))
        for si in range(1, 5):
            x = getattr(self, f'layer{si}')(x)
        B, C, Fr, T = x.shape
        flat = x.reshape(B, C * Fr, T)
        mean = flat.mean(dim=2)
        std = torch.sqrt(flat.var(dim=2, unbiased=False).clamp(min=1e-7))
        emb = self.seg_1(torch.cat([mean, std], dim=1))
        return emb / emb.norm(dim=-1, keepdim=True).clamp(min=1e-8)
