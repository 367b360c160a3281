// Native EXR writer for drt_tpu.
//
// The reference's image output is native C++ through OpenEXR
// (reference: src/write.hpp:9-26 — double -> Imf::Rgba half conversion,
// one RgbaOutputFile::writePixels call). OpenEXR is not vendored here, so
// this implements the same on-disk format directly: EXR 2.0, scanline,
// compression NONE, half-float A/B/G/R planar channels — byte-identical
// layout to drt_tpu/utils/image.py's Python writer and readable by any
// OpenEXR tool.
//
// Exposed C ABI (loaded from Python via ctypes, drt_tpu/utils/native.py):
//   int drt_write_exr(const char *path, const float *rgb /* H*W*3 */,
//                     int width, int height);
// Returns 0 on success, nonzero errno-style code on failure.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// Round-to-nearest-even float32 -> float16 (IEEE 754 binary16),
// matching numpy's astype(float16) used by the Python fallback writer.
uint16_t f2h(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    const uint32_t sign = (x >> 16) & 0x8000u;
    const uint32_t exp8 = (x >> 23) & 0xffu;
    uint32_t man = x & 0x7fffffu;
    if (exp8 == 0xffu) {  // inf / nan
        return static_cast<uint16_t>(sign | 0x7c00u | (man ? 0x200u : 0));
    }
    const int32_t exp5 = static_cast<int32_t>(exp8) - 127 + 15;
    if (exp5 >= 0x1f) {  // overflow -> inf
        return static_cast<uint16_t>(sign | 0x7c00u);
    }
    if (exp5 <= 0) {  // subnormal / underflow
        if (exp5 < -10) return static_cast<uint16_t>(sign);
        man |= 0x800000u;
        const uint32_t shift = static_cast<uint32_t>(14 - exp5);
        uint32_t h = man >> shift;
        const uint32_t rem = man & ((1u << shift) - 1u);
        const uint32_t half = 1u << (shift - 1);
        if (rem > half || (rem == half && (h & 1u))) ++h;
        return static_cast<uint16_t>(sign | h);
    }
    uint32_t h = (static_cast<uint32_t>(exp5) << 10) | (man >> 13);
    const uint32_t rem = man & 0x1fffu;
    if (rem > 0x1000u || (rem == 0x1000u && (h & 1u))) ++h;  // may carry
    return static_cast<uint16_t>(sign | h);
}

void put_i32(std::vector<uint8_t> &b, int32_t v) {
    for (int i = 0; i < 4; ++i) b.push_back((uint32_t(v) >> (8 * i)) & 0xff);
}

void put_u64(std::vector<uint8_t> &b, uint64_t v) {
    for (int i = 0; i < 8; ++i) b.push_back((v >> (8 * i)) & 0xff);
}

void put_f32(std::vector<uint8_t> &b, float v) {
    uint32_t x;
    std::memcpy(&x, &v, 4);
    put_i32(b, static_cast<int32_t>(x));
}

void put_str(std::vector<uint8_t> &b, const char *s) {
    while (*s) b.push_back(static_cast<uint8_t>(*s++));
    b.push_back(0);
}

void attr(std::vector<uint8_t> &b, const char *name, const char *type,
          const std::vector<uint8_t> &value) {
    put_str(b, name);
    put_str(b, type);
    put_i32(b, static_cast<int32_t>(value.size()));
    b.insert(b.end(), value.begin(), value.end());
}

}  // namespace

extern "C" int drt_write_exr(const char *path, const float *rgb,
                             int width, int height) {
    if (!path || !rgb || width <= 0 || height <= 0) return 22;  // EINVAL

    // Header (attribute set and ordering match the Python writer).
    std::vector<uint8_t> chan;
    const char *names[4] = {"A", "B", "G", "R"};
    for (const char *n : names) {
        put_str(chan, n);
        put_i32(chan, 1);  // pixel type HALF
        put_i32(chan, 0);  // pLinear + reserved
        put_i32(chan, 1);  // xSampling
        put_i32(chan, 1);  // ySampling
    }
    chan.push_back(0);

    std::vector<uint8_t> box;
    put_i32(box, 0);
    put_i32(box, 0);
    put_i32(box, width - 1);
    put_i32(box, height - 1);

    std::vector<uint8_t> header;
    attr(header, "channels", "chlist", chan);
    attr(header, "compression", "compression", {0});  // NONE
    attr(header, "dataWindow", "box2i", box);
    attr(header, "displayWindow", "box2i", box);
    attr(header, "lineOrder", "lineOrder", {0});  // INCREASING_Y
    {
        std::vector<uint8_t> f;
        put_f32(f, 1.0f);
        attr(header, "pixelAspectRatio", "float", f);
    }
    {
        std::vector<uint8_t> f;
        put_f32(f, 0.0f);
        put_f32(f, 0.0f);
        attr(header, "screenWindowCenter", "v2f", f);
    }
    {
        std::vector<uint8_t> f;
        put_f32(f, 1.0f);
        attr(header, "screenWindowWidth", "float", f);
    }
    header.push_back(0);  // end of header

    std::vector<uint8_t> magic;
    put_i32(magic, 20000630);
    put_i32(magic, 2);  // version

    const uint64_t offset_table_pos = magic.size() + header.size();
    const uint64_t first_scanline = offset_table_pos + 8ull * height;
    const uint64_t scanline_bytes = 8 + 4ull * width * 2;  // y+size+ABGR

    std::FILE *f = std::fopen(path, "wb");
    if (!f) return 5;  // EIO
    std::fwrite(magic.data(), 1, magic.size(), f);
    std::fwrite(header.data(), 1, header.size(), f);

    std::vector<uint8_t> offsets;
    offsets.reserve(8 * height);
    for (int y = 0; y < height; ++y) {
        put_u64(offsets, first_scanline + uint64_t(y) * scanline_bytes);
    }
    std::fwrite(offsets.data(), 1, offsets.size(), f);

    const uint16_t one_half = f2h(1.0f);
    std::vector<uint16_t> row(4 * width);
    for (int y = 0; y < height; ++y) {
        std::vector<uint8_t> head;
        put_i32(head, y);
        put_i32(head, static_cast<int32_t>(4 * width * 2));
        std::fwrite(head.data(), 1, head.size(), f);
        const float *src = rgb + static_cast<size_t>(y) * width * 3;
        // planar, alphabetical channel order: A, B, G, R
        for (int x = 0; x < width; ++x) row[x] = one_half;
        for (int x = 0; x < width; ++x) row[width + x] = f2h(src[3 * x + 2]);
        for (int x = 0; x < width; ++x) row[2 * width + x] = f2h(src[3 * x + 1]);
        for (int x = 0; x < width; ++x) row[3 * width + x] = f2h(src[3 * x + 0]);
        std::fwrite(row.data(), 2, row.size(), f);
    }
    const int rc = std::ferror(f) ? 5 : 0;
    std::fclose(f);
    return rc;
}
