// Native image decode for the training data loader.
//
// TPU-native equivalent of the runtime IO the reference leaves to PIL
// inside torch DataLoader workers (scene/dataset_readers.py,
// utils/camera_utils.py): PNG (libpng) and JPEG (libjpeg) decoding with
// the GIL released (ctypes calls drop it), so loader threads decode in
// true parallel instead of serializing on the interpreter lock.
//
// Two-call protocol (keeps the ABI trivial for ctypes):
//   imgio_probe(path, &w, &h, &channels) -> 0 on success
//   imgio_decode(path, out_buf)          -> 0 on success; out_buf must be
//       w*h*channels bytes, filled row-major uint8 (RGB or RGBA or gray)
//
// Build: make -C gaussianavatars_tpu/native   (see Makefile; the Python
// wrapper builds on demand and falls back to PIL when unavailable).

#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cstdint>

#include <png.h>
#include <jpeglib.h>

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

int sniff(const char* path) {
    // 0 = unknown, 1 = png, 2 = jpeg
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char magic[8] = {0};
    size_t n = fread(magic, 1, 8, f);
    fclose(f);
    if (n >= 8 && !png_sig_cmp(magic, 0, 8)) return 1;
    if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) return 2;
    return 0;
}

int png_dims(const char* path, int* w, int* h, int* c) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return 2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    switch (color) {
        case PNG_COLOR_TYPE_GRAY: *c = 1; break;
        case PNG_COLOR_TYPE_GRAY_ALPHA: *c = 2; break;
        case PNG_COLOR_TYPE_PALETTE: *c = 3; break;
        case PNG_COLOR_TYPE_RGB: *c = 3; break;
        default: *c = 4; break;
    }
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
}

int png_decode(const char* path, unsigned char* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    png_bytep* rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        delete[] rows;
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return 2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    int h = png_get_image_height(png, info);
    // normalize to 8-bit samples; expand palettes to RGB
    png_set_strip_16(png);
    png_set_packing(png);
    if (png_get_color_type(png, info) == PNG_COLOR_TYPE_PALETTE)
        png_set_palette_to_rgb(png);
    if (png_get_bit_depth(png, info) < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_tRNS_to_alpha(png);
    png_read_update_info(png, info);
    size_t stride = png_get_rowbytes(png, info);
    rows = new png_bytep[h];
    for (int y = 0; y < h; y++) rows[y] = out + y * stride;
    png_read_image(png, rows);
    delete[] rows;
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
}

int jpeg_dims(const char* path, int* w, int* h, int* c) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    *c = cinfo.num_components >= 3 ? 3 : 1;
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

int jpeg_decode(const char* path, unsigned char* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    if (cinfo.num_components >= 3) cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    size_t stride = cinfo.output_width * cinfo.output_components;
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = out + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

}  // namespace

extern "C" {

int imgio_probe(const char* path, int* w, int* h, int* c) {
    int kind = sniff(path);
    if (kind == 1) return png_dims(path, w, h, c);
    if (kind == 2) return jpeg_dims(path, w, h, c);
    return 100 + (kind < 0 ? 1 : 0);  // unsupported format / unreadable
}

int imgio_decode(const char* path, unsigned char* out) {
    int kind = sniff(path);
    if (kind == 1) return png_decode(path, out);
    if (kind == 2) return jpeg_decode(path, out);
    return 100;
}

// composite uint8 HWC onto a background and emit float32 CHW in [0, 1]
// (the loader's hot inner loop, done here so threads skip numpy temporaries)
void imgio_to_chw_f32(const unsigned char* src, int h, int w, int c,
                      const float* bg, float* out) {
    const int plane = h * w;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            const unsigned char* p = src + (y * w + x) * c;
            float r, g, b;
            if (c == 1) {
                r = g = b = p[0] / 255.0f;
            } else if (c == 2) {
                float v = p[0] / 255.0f, a = p[1] / 255.0f;
                r = v * a + bg[0] * (1.0f - a);
                g = v * a + bg[1] * (1.0f - a);
                b = v * a + bg[2] * (1.0f - a);
            } else if (c == 3) {
                r = p[0] / 255.0f; g = p[1] / 255.0f; b = p[2] / 255.0f;
            } else {
                float a = p[3] / 255.0f;
                r = p[0] / 255.0f * a + bg[0] * (1.0f - a);
                g = p[1] / 255.0f * a + bg[1] * (1.0f - a);
                b = p[2] / 255.0f * a + bg[2] * (1.0f - a);
            }
            int i = y * w + x;
            out[i] = r;
            out[plane + i] = g;
            out[2 * plane + i] = b;
        }
    }
}

}  // extern "C"
