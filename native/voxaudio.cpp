// Native incremental log-mel frontend for voxtral_tpu.
//
// C++ twin of the reference engine's C audio layer (voxtral_audio.c:400-662):
// a growing, compacted sample buffer that emits a mel frame as soon as its
// 400-sample window fits, with the same padding rules (buffer starts with
// window/2 + left_pad zeros; finish() appends a 200-sample right reflection
// and drops the final frame). The DFT is the reference's precomputed-table
// direct transform (voxtral_audio.c:338-347) — tables are supplied by the
// Python side so the constants (periodic Hann, Slaney filters) are bit-
// identical to the numpy/JAX paths.
//
// Exposed via a plain C ABI for ctypes; one context per stream, no globals,
// no threads (thread-safety is per-context, like vox_mel_ctx_t).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct MelCtx {
    int window;       // 400
    int hop;          // 160
    int freq_bins;    // 201
    int mel_bins;     // 128
    float log_floor;  // log_mel_max - 8
    // tables (copied at create; transposed for contiguous inner loops)
    std::vector<float> hann;      // [window]
    std::vector<float> dft_cos;   // [freq_bins][window]
    std::vector<float> dft_sin;   // [freq_bins][window]
    std::vector<float> filters;   // [mel_bins][freq_bins]
    // state
    std::vector<float> samples;   // compacted buffer
    int64_t sample_offset = 0;    // global index of samples[0]
    int64_t n_total = 0;          // global sample count (incl. pads)
    std::vector<float> mel;       // [n_frames][mel_bins], compacted
    int64_t frame_offset = 0;     // global frame index of mel row 0
    bool finished = false;

    int64_t n_frames() const { return (int64_t)mel.size() / mel_bins; }

    void compute_available() {
        if (n_total < window) return;  // C++ int division truncates toward 0
        const int64_t next = frame_offset + n_frames();
        const int64_t last_fit = (n_total - window) / hop;
        int64_t n_new = last_fit + 1 - next;
        if (n_new <= 0) return;
        std::vector<float> x((size_t)window);
        std::vector<float> power((size_t)freq_bins);
        const size_t base = mel.size();
        mel.resize(base + (size_t)n_new * mel_bins);
        float* out = mel.data() + base;
        for (int64_t t = next; t < next + n_new; ++t, out += mel_bins) {
            const float* src = samples.data() + (t * hop - sample_offset);
            for (int i = 0; i < window; ++i) x[(size_t)i] = src[i] * hann[(size_t)i];
            for (int k = 0; k < freq_bins; ++k) {
                const float* c = dft_cos.data() + (size_t)k * window;
                const float* s = dft_sin.data() + (size_t)k * window;
                float re = 0.f, im = 0.f;
                for (int i = 0; i < window; ++i) {
                    re += x[(size_t)i] * c[i];
                    im += x[(size_t)i] * s[i];
                }
                power[(size_t)k] = re * re + im * im;
            }
            for (int m = 0; m < mel_bins; ++m) {
                const float* f = filters.data() + (size_t)m * freq_bins;
                float acc = 0.f;
                for (int k = 0; k < freq_bins; ++k) acc += power[(size_t)k] * f[k];
                float v = log10f(acc > 1e-10f ? acc : 1e-10f);
                if (v < log_floor) v = log_floor;
                out[m] = (v + 4.0f) * 0.25f;
            }
        }
        // compact consumed samples (everything before the next frame's start)
        const int64_t needed_from = (frame_offset + n_frames()) * hop;
        const int64_t discard = needed_from - sample_offset;
        if (discard > 0) {
            samples.erase(samples.begin(), samples.begin() + discard);
            sample_offset += discard;
        }
    }
};

}  // namespace

extern "C" {

void* voxmel_create(int window, int hop, int freq_bins, int mel_bins,
                    const float* hann, const float* dft_cos_tw,
                    const float* dft_sin_tw, const float* filters_tm,
                    float log_mel_max, int64_t left_pad_samples) {
    // dft_cos_tw/dft_sin_tw: [window][freq_bins] (numpy layout);
    // filters_tm: [freq_bins][mel_bins]. Transposed here once.
    MelCtx* c = new MelCtx();
    c->window = window; c->hop = hop;
    c->freq_bins = freq_bins; c->mel_bins = mel_bins;
    c->log_floor = log_mel_max - 8.0f;
    c->hann.assign(hann, hann + window);
    c->dft_cos.resize((size_t)freq_bins * window);
    c->dft_sin.resize((size_t)freq_bins * window);
    for (int i = 0; i < window; ++i)
        for (int k = 0; k < freq_bins; ++k) {
            c->dft_cos[(size_t)k * window + i] = dft_cos_tw[(size_t)i * freq_bins + k];
            c->dft_sin[(size_t)k * window + i] = dft_sin_tw[(size_t)i * freq_bins + k];
        }
    c->filters.resize((size_t)mel_bins * freq_bins);
    for (int k = 0; k < freq_bins; ++k)
        for (int m = 0; m < mel_bins; ++m)
            c->filters[(size_t)m * freq_bins + k] = filters_tm[(size_t)k * mel_bins + m];
    const int64_t pad = window / 2 + left_pad_samples;
    c->samples.assign((size_t)pad, 0.0f);
    c->n_total = pad;
    return c;
}

void voxmel_free(void* h) { delete static_cast<MelCtx*>(h); }

int64_t voxmel_feed(void* h, const float* s, int64_t n) {
    MelCtx* c = static_cast<MelCtx*>(h);
    if (c->finished || n < 0) return -1;
    const int64_t before = c->n_frames();
    c->samples.insert(c->samples.end(), s, s + n);
    c->n_total += n;
    c->compute_available();
    // NEW frames this feed (the python MelStream.feed contract; the total
    // buffered count is voxmel_n_frames)
    return c->n_frames() - before;
}

int64_t voxmel_finish(void* h) {
    MelCtx* c = static_cast<MelCtx*>(h);
    if (c->finished) return c->n_frames();
    // right reflection: src = end - 2 - i (voxtral_audio.c:615-623)
    const int half = c->window / 2;
    const size_t end = c->samples.size();
    std::vector<float> tail((size_t)half);
    for (int i = 0; i < half; ++i)
        // guard the size_t underflow when the buffer is shorter than the
        // reflection span (reachable only with left_pad_samples ~ 0;
        // reflect-of-nothing is silence)
        tail[(size_t)i] = (end >= (size_t)i + 2)
                              ? c->samples[end - 2 - (size_t)i] : 0.0f;
    c->samples.insert(c->samples.end(), tail.begin(), tail.end());
    c->n_total += half;
    c->compute_available();
    if (c->n_frames() > 0)
        c->mel.resize(c->mel.size() - (size_t)c->mel_bins);  // drop last frame
    c->finished = true;
    return c->n_frames();
}

int64_t voxmel_n_frames(void* h) { return static_cast<MelCtx*>(h)->n_frames(); }

int64_t voxmel_frame_offset(void* h) {
    return static_cast<MelCtx*>(h)->frame_offset;
}

void voxmel_frames(void* h, float* out) {
    MelCtx* c = static_cast<MelCtx*>(h);
    std::memcpy(out, c->mel.data(), c->mel.size() * sizeof(float));
}

void voxmel_discard_before(void* h, int64_t global_frame) {
    MelCtx* c = static_cast<MelCtx*>(h);
    int64_t drop = global_frame - c->frame_offset;
    if (drop <= 0) return;
    if (drop > c->n_frames()) drop = c->n_frames();
    c->mel.erase(c->mel.begin(), c->mel.begin() + drop * c->mel_bins);
    c->frame_offset += drop;
}

// Linear resampler (voxtral_audio.c:110-137 semantics, matches
// audio/wav.py:resample_linear).
int64_t voxwav_resample_linear(const float* in, int64_t n, int rate_in,
                               int rate_out, float* out, int64_t out_cap) {
    if (rate_in == rate_out) {
        if (n > out_cap) return -1;
        std::memcpy(out, in, (size_t)n * sizeof(float));
        return n;
    }
    // round-half-to-even, matching python round() in wav.py:resample_linear
    const int64_t n_out = (int64_t)nearbyint((double)n * rate_out / rate_in);
    if (n_out > out_cap) return -1;
    for (int64_t j = 0; j < n_out; ++j) {
        const double pos = (double)j * rate_in / rate_out;
        int64_t i0 = (int64_t)pos;
        if (i0 > n - 1) i0 = n - 1;
        int64_t i1 = i0 + 1 < n ? i0 + 1 : n - 1;
        const float frac = (float)(pos - (double)i0);
        out[j] = in[i0] * (1.0f - frac) + in[i1] * frac;
    }
    return n_out;
}

}  // extern "C"
