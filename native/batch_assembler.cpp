// Host-side batch assembler: read + decode + pad-pack a whole audio batch
// in one native call (no GIL, no per-utterance Python).
//
// Role: the reference pipelines audio through torch DataLoader workers
// (speechain iterator/abs.py:428-439). On a low-core TPU-VM host the Python
// per-utterance overhead (file object churn, numpy slicing, pad copies)
// caps loader throughput below device consumption; this packs the padded
// (B, T) int16 batch entirely in C. WAV (RIFF PCM16 mono) is parsed inline;
// FLAC delegates to flac_decoder.cpp's int16 decoder in the same library.
//
// Contract: `out` is a zero-initialized (b_pad, t_pad) int16 row-major
// buffer. Row i receives min(file_samples, t_pad) samples of file i;
// lens[i] reports the count actually written. Rows >= n_files stay zero
// (batch-bucket padding). Returns 0 on success or -(i+1) if file i is
// unsupported (caller falls back to the Python path).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" long long flac_decode_file_i16(const char *path, int16_t **out,
                                          int *sample_rate);
extern "C" void flac_free_i16(int16_t *p);

namespace {

// Parse a RIFF/WAVE file; return samples written to dst (<= cap), or -1 if
// the layout is not mono 16-bit PCM.
long long read_wav_i16(const char *path, int16_t *dst, long long cap,
                       int expected_sr) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return -1;
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(f);
    return -1;
  }
  int channels = 0, bits = 0, fmt = 0;
  long long written = -1;
  unsigned char ck[8];
  while (std::fread(ck, 1, 8, f) == 8) {
    uint32_t size = ck[4] | (ck[5] << 8) | (ck[6] << 16) |
                    (uint32_t(ck[7]) << 24);
    if (!std::memcmp(ck, "fmt ", 4)) {
      unsigned char fmtbuf[16];
      if (size < 16 || std::fread(fmtbuf, 1, 16, f) != 16) break;
      fmt = fmtbuf[0] | (fmtbuf[1] << 8);
      channels = fmtbuf[2] | (fmtbuf[3] << 8);
      bits = fmtbuf[14] | (fmtbuf[15] << 8);
      int sr = fmtbuf[4] | (fmtbuf[5] << 8) | (fmtbuf[6] << 16) |
               (fmtbuf[7] << 24);
      if (expected_sr > 0 && sr != expected_sr) break;  // needs resampling
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
    } else if (!std::memcmp(ck, "data", 4)) {
      if (fmt != 1 || channels != 1 || bits != 16) break;
      long long n = size / 2;
      if (n > cap) n = cap;
      written = (long long)std::fread(dst, 2, (size_t)n, f);
      break;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  return written;
}

bool has_suffix(const char *s, const char *suf) {
  size_t ls = std::strlen(s), lf = std::strlen(suf);
  return ls >= lf && !std::strcmp(s + ls - lf, suf);
}

}  // namespace

extern "C" long long batch_assemble_i16(const char **paths, int n_files,
                                        int16_t *out, long long t_pad,
                                        long long *lens, int expected_sr) {
  for (int i = 0; i < n_files; ++i) {
    int16_t *row = out + (long long)i * t_pad;
    long long n = -1;
    if (has_suffix(paths[i], ".flac")) {
      int16_t *buf = nullptr;
      int sr = 0;
      long long total = flac_decode_file_i16(paths[i], &buf, &sr);
      if (total > 0 && buf &&
          (expected_sr <= 0 || sr == expected_sr)) {
        n = total < t_pad ? total : t_pad;
        std::memcpy(row, buf, (size_t)n * 2);
        flac_free_i16(buf);
      } else if (buf) {
        flac_free_i16(buf);
        n = -1;
      }
    } else {
      n = read_wav_i16(paths[i], row, t_pad, expected_sr);
    }
    if (n < 0) return -(long long)(i + 1);
    lens[i] = n;
  }
  return 0;
}
