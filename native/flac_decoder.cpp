// Native FLAC decoder for speechain_tpu.
//
// The reference toolkit reads FLAC via soundfile/libsndfile (a third-party
// native dependency, reference utilbox/data_loading_util.py:21-89). This
// image ships neither, so the host-side audio layer gets its own decoder:
// a self-contained implementation of the FLAC bitstream (constant/verbatim/
// fixed/LPC subframes, Rice-coded residuals, all standard bit depths and
// channel decorrelation modes), exposed through a C ABI consumed by ctypes
// (speechain_tpu/utils/fileio.py::read_flac).
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte_pos = 0;
    int bit_pos = 0;  // 0..7, MSB first
    bool error = false;

    BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

    inline uint32_t read_bit() {
        if (byte_pos >= size) { error = true; return 0; }
        uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
        if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
        return b;
    }

    uint64_t read_bits(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n == 0) return 0;
        uint64_t sign = 1ull << (n - 1);
        if (v & sign) return (int64_t)(v | ~((sign << 1) - 1));
        return (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (!error && read_bit() == 0) ++q;
        return q;
    }

    // Rice/Golomb code: unary quotient + k-bit remainder, zigzag-signed
    int64_t read_rice(int k) {
        uint32_t q = read_unary();
        uint64_t r = read_bits(k);
        uint64_t u = ((uint64_t)q << k) | r;
        return (u >> 1) ^ -(int64_t)(u & 1);
    }

    void align() { if (bit_pos) { bit_pos = 0; ++byte_pos; } }

    uint64_t read_utf8() {  // FLAC's extended UTF-8 coded number
        uint64_t b0 = read_bits(8);
        int extra = 0;
        uint64_t v;
        if ((b0 & 0x80) == 0) { return b0; }
        else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
        else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
        else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
        else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
        else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
        else if (b0 == 0xFE) { extra = 6; v = 0; }
        else { error = true; return 0; }
        for (int i = 0; i < extra; ++i) v = (v << 6) | (read_bits(8) & 0x3F);
        return v;
    }
};

struct StreamInfo {
    uint32_t sample_rate = 0;
    uint32_t channels = 0;
    uint32_t bits_per_sample = 0;
    uint64_t total_samples = 0;
};

bool decode_residual(BitReader& br, int order, int block_size,
                     std::vector<int64_t>& out) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    int escape = method == 0 ? 15 : 31;
    uint32_t part_order = (uint32_t)br.read_bits(4);
    uint32_t n_parts = 1u << part_order;
    int samples_per_part = block_size >> part_order;
    if (samples_per_part <= 0) return false;
    int idx = order;
    for (uint32_t p = 0; p < n_parts; ++p) {
        int count = samples_per_part - (p == 0 ? order : 0);
        if (count < 0) return false;
        int k = (int)br.read_bits(param_bits);
        if (k == escape) {
            int nbits = (int)br.read_bits(5);
            for (int i = 0; i < count; ++i) out[idx++] = br.read_signed(nbits);
        } else {
            for (int i = 0; i < count; ++i) out[idx++] = br.read_rice(k);
        }
        if (br.error) return false;
    }
    return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
    if (br.read_bit() != 0) return false;  // zero pad bit
    uint32_t type = (uint32_t)br.read_bits(6);
    uint32_t wasted = 0;
    if (br.read_bit()) wasted = br.read_unary() + 1;
    bps -= (int)wasted;
    out.assign(block_size, 0);

    if (type == 0) {                                   // CONSTANT
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < block_size; ++i) out[i] = v;
    } else if (type == 1) {                            // VERBATIM
        for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {              // FIXED, order 0-4
        int order = (int)type - 8;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        if (!decode_residual(br, order, block_size, out)) return false;
        // fixed predictors (FLAC spec 9.2.2)
        for (int i = order; i < block_size; ++i) {
            int64_t p = 0;
            switch (order) {
                case 0: p = 0; break;
                case 1: p = out[i - 1]; break;
                case 2: p = 2 * out[i - 1] - out[i - 2]; break;
                case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
                    break;
                case 4: p = 4 * out[i - 1] - 6 * out[i - 2]
                            + 4 * out[i - 3] - out[i - 4]; break;
            }
            out[i] += p;
        }
    } else if (type >= 32) {                           // LPC, order 1-32
        int order = (int)type - 31;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // invalid per spec
        int shift = (int)br.read_signed(5);
        std::vector<int64_t> coef(order);
        for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (int i = order; i < block_size; ++i) {
            int64_t acc = 0;
            for (int j = 0; j < order; ++j)
                acc += coef[j] * out[i - 1 - j];
            out[i] += acc >> shift;
        }
    } else {
        return false;
    }
    if (wasted)
        for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
    return !br.error;
}

const uint32_t BLOCK_SIZES[16] = {0, 192, 576, 1152, 2304, 4608, 0, 0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384,
                                  32768};
const uint32_t SAMPLE_RATES[12] = {0, 88200, 176400, 192000, 8000, 16000,
                                   22050, 24000, 32000, 44100, 48000, 96000};
const int BPS_TABLE[8] = {0, 8, 12, 0, 16, 20, 24, 32};

}  // namespace

extern "C" {

// Decode a FLAC file. On success returns the number of samples per channel
// and fills *out (malloc'd interleaved float32, caller frees via
// flac_free), *sample_rate, *channels. Returns -1 on failure.
struct DecodedPcm {
    std::vector<std::vector<int32_t>> ch;   // raw integer samples
    StreamInfo si;
    int bps = 0;
};

// shared bitstream decode: fills raw integer PCM per channel; returns
// sample count or -1
static long long flac_decode_raw(const char* path, DecodedPcm& dp) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)fsize);
    if (fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
        fclose(f);
        return -1;
    }
    fclose(f);
    if (fsize < 8 || memcmp(buf.data(), "fLaC", 4) != 0) return -1;

    size_t pos = 4;
    StreamInfo si;
    bool last = false;
    while (!last && pos + 4 <= buf.size()) {   // metadata blocks
        uint8_t hdr = buf[pos];
        last = hdr & 0x80;
        uint8_t type = hdr & 0x7F;
        uint32_t len = (buf[pos + 1] << 16) | (buf[pos + 2] << 8)
                       | buf[pos + 3];
        pos += 4;
        if (type == 0 && len >= 34) {          // STREAMINFO
            const uint8_t* p = buf.data() + pos;
            si.sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
            si.channels = ((p[12] >> 1) & 0x7) + 1;
            si.bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
            si.total_samples = ((uint64_t)(p[13] & 0x0F) << 32)
                               | ((uint64_t)p[14] << 24)
                               | ((uint64_t)p[15] << 16)
                               | ((uint64_t)p[16] << 8) | p[17];
        }
        pos += len;
    }
    if (si.sample_rate == 0 || si.channels == 0) return -1;

    std::vector<std::vector<int32_t>>& pcm = dp.ch;
    pcm.assign(si.channels, {});
    if (si.total_samples)
        for (auto& c : pcm) c.reserve((size_t)si.total_samples);
    int out_bps = 0;

    BitReader br(buf.data() + pos, buf.size() - pos);
    std::vector<std::vector<int64_t>> ch_data;
    while (!br.error && br.byte_pos + 2 <= br.size) {
        // frame header: sync code 11111111 111110xx
        uint64_t sync = br.read_bits(14);
        if (br.error) break;
        if (sync != 0x3FFE) break;
        br.read_bit();                         // reserved
        uint32_t blocking = br.read_bit();     // 0=fixed,1=variable
        (void)blocking;
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_code = (uint32_t)br.read_bits(4);
        uint32_t bps_code = (uint32_t)br.read_bits(3);
        br.read_bit();                         // reserved
        br.read_utf8();                        // frame/sample number
        uint32_t block_size;
        if (bs_code == 6) block_size = (uint32_t)br.read_bits(8) + 1;
        else if (bs_code == 7) block_size = (uint32_t)br.read_bits(16) + 1;
        else block_size = BLOCK_SIZES[bs_code];
        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
        int bps = bps_code < 8 ? BPS_TABLE[bps_code] : 0;
        if (bps == 0) bps = (int)si.bits_per_sample;
        br.read_bits(8);                       // header CRC-8 (unchecked)
        if (br.error || block_size == 0) break;

        int n_ch = (int)si.channels;
        int mode = 0;  // 0=independent,1=left-side,2=right-side,3=mid-side
        if (ch_code <= 7) { n_ch = (int)ch_code + 1; mode = 0; }
        else if (ch_code == 8) { n_ch = 2; mode = 1; }
        else if (ch_code == 9) { n_ch = 2; mode = 2; }
        else if (ch_code == 10) { n_ch = 2; mode = 3; }
        else break;

        ch_data.assign(n_ch, {});
        bool ok = true;
        for (int c = 0; c < n_ch && ok; ++c) {
            int sub_bps = bps;
            // side channels carry one extra bit
            if ((mode == 1 && c == 1) || (mode == 2 && c == 0)
                || (mode == 3 && c == 1))
                sub_bps += 1;
            ok = decode_subframe(br, (int)block_size, sub_bps, ch_data[c]);
        }
        if (!ok) break;
        br.align();
        br.read_bits(16);                      // frame CRC-16 (unchecked)

        // undo inter-channel decorrelation
        if (mode == 1) {          // left-side: right = left - side
            for (uint32_t i = 0; i < block_size; ++i)
                ch_data[1][i] = ch_data[0][i] - ch_data[1][i];
        } else if (mode == 2) {   // right-side: left = right + side
            for (uint32_t i = 0; i < block_size; ++i)
                ch_data[0][i] = ch_data[1][i] + ch_data[0][i];
        } else if (mode == 3) {   // mid-side
            for (uint32_t i = 0; i < block_size; ++i) {
                int64_t side = ch_data[1][i];
                int64_t mid = (ch_data[0][i] << 1) | (side & 1);
                ch_data[0][i] = (mid + side) >> 1;
                ch_data[1][i] = (mid - side) >> 1;
            }
        }

        out_bps = bps;
        for (int c = 0; c < n_ch; ++c)
            for (uint32_t i = 0; i < block_size; ++i)
                pcm[(size_t)c].push_back((int32_t)ch_data[c][i]);
        if (si.total_samples && pcm[0].size() >= si.total_samples) break;
    }

    if (pcm[0].empty()) return -1;
    size_t n = pcm[0].size();
    if (si.total_samples && n > si.total_samples) n = si.total_samples;
    dp.si = si;
    dp.bps = out_bps;
    return (long long)n;
}

long long flac_decode_file(const char* path, float** out,
                           int* sample_rate, int* channels) {
    DecodedPcm dp;
    long long n = flac_decode_raw(path, dp);
    if (n <= 0) return -1;
    float scale = 1.0f / (float)(1u << (dp.bps - 1));
    float* result = (float*)malloc((size_t)n * dp.si.channels * sizeof(float));
    if (!result) return -1;
    for (long long i = 0; i < n; ++i)
        for (uint32_t c = 0; c < dp.si.channels; ++c)
            result[i * dp.si.channels + c] = (float)dp.ch[c][(size_t)i] * scale;
    *out = result;
    *sample_rate = (int)dp.si.sample_rate;
    *channels = (int)dp.si.channels;
    return n;
}

// int16 fast path: mono 16-bit streams (the LibriSpeech case) come out as
// raw PCM so the TPU frontend can apply the exact 2^-15 scale on device.
// Returns -2 when the stream is not mono/16-bit (caller falls back to the
// float decoder).
long long flac_decode_file_i16(const char* path, int16_t** out,
                               int* sample_rate) {
    DecodedPcm dp;
    long long n = flac_decode_raw(path, dp);
    if (n <= 0) return -1;
    if (dp.bps != 16 || dp.si.channels != 1) return -2;
    int16_t* result = (int16_t*)malloc((size_t)n * sizeof(int16_t));
    if (!result) return -1;
    for (long long i = 0; i < n; ++i)
        result[i] = (int16_t)dp.ch[0][(size_t)i];
    *out = result;
    *sample_rate = (int)dp.si.sample_rate;
    return n;
}

void flac_free(float* p) { free(p); }
void flac_free_i16(int16_t* p) { free(p); }

}  // extern "C"
