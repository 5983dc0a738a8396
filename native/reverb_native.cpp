// reverb_native: host-side audio runtime for the TPU data pipeline.
//
// TPU-native counterpart of the reference's native audio dependencies
// (torchaudio sox/kaldi-compliance C++ — SURVEY.md §2.9): WAV decode,
// windowed-sinc polyphase resampling, and kaldi-compatible log-mel fbank
// (povey window, preemphasis, radix-2 FFT, kaldi mel scale), exposed with a
// C ABI for ctypes.  The fbank math matches reverb_tpu/frontend/fbank.py
// bit-for-bit in structure (same spec), so host- and device-computed
// features are interchangeable.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 reverb_native.cpp
//        -o libreverb_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ------------------------------ WAV decode ------------------------------

// Parse a RIFF/WAVE buffer. Returns 0 on success. Caller provides out buffer
// sized via a first query call (out == nullptr → only fills meta).
int rn_decode_wav(const uint8_t* data, int64_t len, float* out,
                  int64_t* n_frames, int32_t* channels, int32_t* sample_rate) {
    if (len < 44 || memcmp(data, "RIFF", 4) || memcmp(data + 8, "WAVE", 4))
        return -1;
    int64_t pos = 12;
    uint16_t fmt_code = 0, n_ch = 0, bits = 0;
    uint32_t sr = 0;
    const uint8_t* body = nullptr;
    uint32_t body_len = 0;
    while (pos + 8 <= len) {
        uint32_t size;
        memcpy(&size, data + pos + 4, 4);
        const uint8_t* chunk = data + pos + 8;
        if (!memcmp(data + pos, "fmt ", 4) && size >= 16) {
            memcpy(&fmt_code, chunk, 2);
            memcpy(&n_ch, chunk + 2, 2);
            memcpy(&sr, chunk + 4, 4);
            memcpy(&bits, chunk + 14, 2);
            if (fmt_code == 0xFFFE) fmt_code = 1;
        } else if (!memcmp(data + pos, "data", 4)) {
            body = chunk;
            body_len = (uint32_t)std::min<int64_t>(size, len - pos - 8);
        }
        pos += 8 + size + (size & 1);
    }
    if (!body || !n_ch || !bits) return -2;
    int64_t frames = 0;
    int bytes = bits / 8;
    frames = body_len / (bytes * n_ch);
    *n_frames = frames;
    *channels = n_ch;
    *sample_rate = (int32_t)sr;
    if (!out) return 0;
    int64_t total = frames * n_ch;
    if (fmt_code == 1 && bits == 16) {
        const int16_t* p = (const int16_t*)body;
        for (int64_t i = 0; i < total; i++) out[i] = p[i] / 32768.0f;
    } else if (fmt_code == 1 && bits == 32) {
        const int32_t* p = (const int32_t*)body;
        for (int64_t i = 0; i < total; i++)
            out[i] = (float)(p[i] / 2147483648.0);
    } else if (fmt_code == 1 && bits == 24) {
        for (int64_t i = 0; i < total; i++) {
            int32_t v = body[3 * i] | (body[3 * i + 1] << 8)
                        | (body[3 * i + 2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            out[i] = v / 8388608.0f;
        }
    } else if (fmt_code == 3 && bits == 32) {
        memcpy(out, body, total * 4);
    } else if (fmt_code == 1 && bits == 8) {
        for (int64_t i = 0; i < total; i++)
            out[i] = ((int)body[i] - 128) / 128.0f;
    } else {
        return -3;
    }
    return 0;
}

// ------------------------------ resample ------------------------------

// Windowed-sinc polyphase resampling (Hann window, zero-phase).
int rn_resample(const float* in, int64_t n_in, int32_t sr_in, int32_t sr_out,
                float* out, int64_t* n_out) {
    if (sr_in == sr_out) {
        if (out) memcpy(out, in, n_in * sizeof(float));
        *n_out = n_in;
        return 0;
    }
    int g = 1;
    { int a = sr_in, b = sr_out; while (b) { int t = a % b; a = b; b = t; }
      g = a; }
    int up = sr_out / g, down = sr_in / g;
    int64_t out_len = (n_in * up + down - 1) / down;
    *n_out = out_len;
    if (!out) return 0;
    const int half_width = 16;  // taps per phase (each side)
    double cutoff = 0.95 * 0.5 * std::min(1.0, (double)up / down);
    for (int64_t j = 0; j < out_len; j++) {
        // output sample j corresponds to input position j*down/up
        double center = (double)j * down / up;
        int64_t lo = (int64_t)std::floor(center) - half_width;
        int64_t hi = (int64_t)std::floor(center) + half_width + 1;
        double acc = 0.0;
        double scale = 2.0 * cutoff;
        for (int64_t i = std::max<int64_t>(lo, 0);
             i <= std::min<int64_t>(hi, n_in - 1); i++) {
            double x = center - (double)i;
            double sinc = (x == 0.0) ? 1.0
                : std::sin(2.0 * M_PI * cutoff * x) / (2.0 * M_PI * cutoff * x);
            double w = 0.5 + 0.5 * std::cos(M_PI * x / (half_width + 1));
            acc += in[i] * scale * sinc * w;
        }
        out[j] = (float)acc;
    }
    return 0;
}

// ------------------------------ fbank ------------------------------

static void fft_radix2(std::vector<double>& re, std::vector<double>& im) {
    const size_t n = re.size();
    for (size_t i = 1, j = 0; i < n; i++) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        double ang = -2.0 * M_PI / (double)len;
        double wr = std::cos(ang), wi = std::sin(ang);
        for (size_t i = 0; i < n; i += len) {
            double cr = 1.0, ci = 0.0;
            for (size_t k = 0; k < len / 2; k++) {
                double ur = re[i + k], ui = im[i + k];
                double vr = re[i + k + len / 2] * cr
                            - im[i + k + len / 2] * ci;
                double vi = re[i + k + len / 2] * ci
                            + im[i + k + len / 2] * cr;
                re[i + k] = ur + vr; im[i + k] = ui + vi;
                re[i + k + len / 2] = ur - vr; im[i + k + len / 2] = ui - vi;
                double ncr = cr * wr - ci * wi;
                ci = cr * wi + ci * wr; cr = ncr;
            }
        }
    }
}

static double mel_scale(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

// Kaldi-compatible log-mel fbank on an int16-scale waveform.
// out must hold n_frames*num_bins floats; n_frames = 1+(n-400)/160 for 16k.
int rn_fbank(const float* wave, int64_t n, int32_t sample_rate,
             int32_t num_bins, float frame_length_ms, float frame_shift_ms,
             float* out, int64_t* n_frames_out) {
    const int win = (int)(sample_rate * frame_length_ms / 1000.0f);
    const int shift = (int)(sample_rate * frame_shift_ms / 1000.0f);
    int padded = 1; while (padded < win) padded <<= 1;
    int64_t n_frames = (n < win) ? 0 : 1 + (n - win) / shift;
    *n_frames_out = n_frames;
    if (!out || n_frames == 0) return 0;

    // povey window
    std::vector<double> window(win);
    for (int i = 0; i < win; i++)
        window[i] = std::pow(0.5 - 0.5 * std::cos(2.0 * M_PI * i / (win - 1)),
                             0.85);
    // mel banks over padded/2 fft bins (nyquist excluded)
    const int nfft_bins = padded / 2;
    const double low = 20.0, high = sample_rate / 2.0;
    const double mlo = mel_scale(low), mhi = mel_scale(high);
    const double delta = (mhi - mlo) / (num_bins + 1);
    std::vector<double> banks((size_t)num_bins * nfft_bins, 0.0);
    for (int b = 0; b < num_bins; b++) {
        double l = mlo + b * delta, c = mlo + (b + 1) * delta,
               r = mlo + (b + 2) * delta;
        for (int k = 0; k < nfft_bins; k++) {
            double f = (double)k * sample_rate / padded;
            double m = mel_scale(f);
            double w = std::min((m - l) / (c - l), (r - m) / (r - c));
            if (w > 0) banks[(size_t)b * nfft_bins + k] = w;
        }
    }
    const double eps = 1.1920928955078125e-07;  // float32 eps
    std::vector<double> re(padded), im(padded), frame(win);
    for (int64_t t = 0; t < n_frames; t++) {
        const float* src = wave + t * shift;
        double mean = 0;
        for (int i = 0; i < win; i++) mean += src[i];
        mean /= win;
        for (int i = 0; i < win; i++) frame[i] = src[i] - mean;
        // preemphasis 0.97
        for (int i = win - 1; i > 0; i--)
            frame[i] -= 0.97 * frame[i - 1];
        frame[0] -= 0.97 * frame[0];
        for (int i = 0; i < win; i++) { re[i] = frame[i] * window[i]; im[i] = 0; }
        for (int i = win; i < padded; i++) { re[i] = 0; im[i] = 0; }
        fft_radix2(re, im);
        for (int b = 0; b < num_bins; b++) {
            double acc = 0;
            const double* bank = &banks[(size_t)b * nfft_bins];
            for (int k = 0; k < nfft_bins; k++) {
                double p = re[k] * re[k] + im[k] * im[k];
                acc += p * bank[k];
            }
            out[t * num_bins + b] = (float)std::log(std::max(acc, eps));
        }
    }
    return 0;
}

}  // extern "C"
