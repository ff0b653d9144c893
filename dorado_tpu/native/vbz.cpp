// svb16 (stream-variable-byte, 16-bit) decode fast path for the VBZ signal
// codec (io/vbz.py). POD5 signal chunks are zstd(svb16(zigzag(delta(int16))))
// — the reference links the pod5-file-format C library for this
// (dorado/data_loader/DataLoader.cpp:13); here the zstd layer stays in
// python-zstandard (itself C) and this loop replaces the numpy gather
// pipeline, which measured ~13 Msamples/s/thread vs a chip consuming 35-80.
//
// ctypes releases the GIL for the call, so the POD5 loader's worker threads
// decode in parallel.

#include <cstdint>

extern "C" {

// Returns 0 on success, -1 on a truncated payload.
int svb16_decode_native(const uint8_t* raw,
                        int64_t raw_len,
                        int64_t count,
                        int zigzag,
                        int delta,
                        int16_t* out) {
    if (count == 0) {
        return 0;
    }
    const int64_t key_len = (count + 7) / 8;
    if (raw_len < key_len) {
        return -1;
    }
    const uint8_t* keys = raw;
    const uint8_t* data = raw + key_len;
    const uint8_t* end = raw + raw_len;
    uint16_t acc = 0;
    for (int64_t i = 0; i < count; ++i) {
        const int two = (keys[i >> 3] >> (i & 7)) & 1;
        uint16_t u;
        if (two) {
            if (data + 2 > end) {
                return -1;
            }
            u = static_cast<uint16_t>(data[0]) |
                static_cast<uint16_t>(static_cast<uint16_t>(data[1]) << 8);
            data += 2;
        } else {
            if (data + 1 > end) {
                return -1;
            }
            u = data[0];
            data += 1;
        }
        uint16_t v = u;
        if (zigzag) {
            v = static_cast<uint16_t>((u >> 1) ^ static_cast<uint16_t>(-(u & 1)));
        }
        if (delta) {
            acc = static_cast<uint16_t>(acc + v);  // wraps like the int16 cumsum
            out[i] = static_cast<int16_t>(acc);
        } else {
            out[i] = static_cast<int16_t>(v);
        }
    }
    return 0;
}

}  // extern "C"
