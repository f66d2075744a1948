// Native Kaldi-ark feature loader: read + splice + skip + downsample-pad
// in one pass, GIL-free (called via ctypes, which releases the GIL for the
// duration of the call — a python ThreadPoolExecutor over utterances gets
// real parallel file IO + processing).
//
// Replaces the host-side hot path of SpeechDataset.__getitem__
// (data/dataset.py: kaldi_io.load_mat -> _splice_numpy -> skip -> pad),
// the TPU-native equivalent of the reference's torch DataLoader worker
// processes (timit/utils/data_loader.py:148-151, num_workers).
//
// Format: uncompressed binary float matrices "\0BFM " (the format our
// ArkWriter emits and Kaldi's copy-feats default); anything else returns
// a sentinel so callers fall back to the python reader.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr int ERR_IO = -1;        // open/seek/read failure
constexpr int ERR_FORMAT = -2;    // not an uncompressed "BFM " matrix
constexpr int ERR_CAPACITY = -3;  // caller buffer too small

struct Header {
    int rows = 0;
    int cols = 0;
    long data_off = 0;  // absolute file offset of the float payload
};

int read_header(FILE* f, long offset, Header* h) {
    if (std::fseek(f, offset, SEEK_SET) != 0) return ERR_IO;
    unsigned char head[2];
    if (std::fread(head, 1, 2, f) != 2) return ERR_IO;
    if (head[0] != 0x00 || head[1] != 'B') return ERR_FORMAT;
    char tok[4];
    if (std::fread(tok, 1, 3, f) != 3) return ERR_IO;
    if (std::memcmp(tok, "FM ", 3) != 0) return ERR_FORMAT;
    unsigned char size_byte;
    int32_t dims[2];
    for (int i = 0; i < 2; ++i) {
        if (std::fread(&size_byte, 1, 1, f) != 1 || size_byte != 4)
            return ERR_FORMAT;
        if (std::fread(&dims[i], 4, 1, f) != 1) return ERR_IO;
    }
    h->rows = dims[0];
    h->cols = dims[1];
    h->data_off = std::ftell(f);
    if (h->rows < 0 || h->cols <= 0) return ERR_FORMAT;
    return 0;
}

}  // namespace

extern "C" {

// Peek the (rows, cols) of the matrix at `path:offset`.
// Returns 0 on success, ERR_* otherwise.
int ark_dims(const char* path, long offset, int* rows, int* cols) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return ERR_IO;
    Header h;
    int rc = read_header(f, offset, &h);
    std::fclose(f);
    if (rc != 0) return rc;
    *rows = h.rows;
    *cols = h.cols;
    return 0;
}

// Load the matrix at `path:offset`, apply edge-replicated context splicing
// (left/right frames), frame skipping (keep every `skip`-th row) and
// zero-row padding to a multiple of `downsample`, writing the processed
// (rows_out, cols*(left+1+right)) float32 matrix into `out`.
// Returns rows_out on success, ERR_* otherwise.
int ark_load_processed(const char* path, long offset, int left, int right,
                       int skip, int downsample, float* out,
                       long out_capacity_rows) {
    if (skip < 1) skip = 1;
    if (downsample < 1) downsample = 1;
    FILE* f = std::fopen(path, "rb");
    if (!f) return ERR_IO;
    Header h;
    int rc = read_header(f, offset, &h);
    if (rc != 0) {
        std::fclose(f);
        return rc;
    }
    const long rows = h.rows, cols = h.cols;
    std::vector<float> raw(static_cast<size_t>(rows) * cols);
    size_t want = static_cast<size_t>(rows) * cols;
    if (std::fread(raw.data(), 4, want, f) != want) {
        std::fclose(f);
        return ERR_IO;
    }
    std::fclose(f);

    const int ctx = left + 1 + right;
    const long cols_out = cols * ctx;
    const long rows_skipped = (rows + skip - 1) / skip;  // == len(a[::skip])
    long rows_out = rows_skipped;
    const long rem = rows_skipped % downsample;
    if (rem) rows_out += downsample - rem;
    if (rows_out > out_capacity_rows) return ERR_CAPACITY;

    for (long r = 0; r < rows_skipped; ++r) {
        const long i = r * skip;
        float* dst = out + r * cols_out;
        for (int s = -left; s <= right; ++s) {
            long src = i + s;
            if (src < 0) src = 0;
            if (src >= rows) src = rows - 1;
            std::memcpy(dst, raw.data() + src * cols, cols * 4);
            dst += cols;
        }
    }
    if (rows_out > rows_skipped) {
        std::memset(out + rows_skipped * cols_out, 0,
                    static_cast<size_t>(rows_out - rows_skipped) * cols_out * 4);
    }
    return static_cast<int>(rows_out);
}

}  // extern "C"
