/* Fixture/ground-truth helper for the arithmetic-JPEG decoder work:
 *
 *   jpeg_arith_tool enc  <in.ppm> <out.jpg> <quality> <arith:0|1> <subsamp:444|420> <restart>
 *   jpeg_arith_tool coef <in.jpg>            -- dump per-block zigzag DCT coefficients
 *   jpeg_arith_tool dec  <in.jpg> <out.ppm>  -- decode to P6 PPM (plain upsampling)
 *
 * Built against the SYSTEM libjpeg (the same binary the baseline
 * Huffman decoder was cross-validated against). Used only to GENERATE
 * committed test fixtures and ground truth — never at runtime.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

static unsigned char *read_ppm(const char *path, int *w, int *h) {
  FILE *f = fopen(path, "rb");
  if (!f) die("open ppm");
  int maxv;
  if (fscanf(f, "P6 %d %d %d", w, h, &maxv) != 3) die("ppm header");
  fgetc(f);
  unsigned char *buf = malloc((size_t)(*w) * (*h) * 3);
  if (fread(buf, 1, (size_t)(*w) * (*h) * 3, f) != (size_t)(*w) * (*h) * 3)
    die("ppm body");
  fclose(f);
  return buf;
}

static void cmd_enc(int argc, char **argv) {
  int w, h;
  unsigned char *rgb = read_ppm(argv[2], &w, &h);
  int quality = atoi(argv[4]);
  int arith = atoi(argv[5]);
  int sub420 = strcmp(argv[6], "420") == 0;
  int restart = argc > 7 ? atoi(argv[7]) : 0;
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr err;
  c.err = jpeg_std_error(&err);
  jpeg_create_compress(&c);
  FILE *out = fopen(argv[3], "wb");
  if (!out) die("open out");
  jpeg_stdio_dest(&c, out);
  c.image_width = w;
  c.image_height = h;
  c.input_components = 3;
  c.in_color_space = JCS_RGB;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = arith ? TRUE : FALSE;
  c.restart_interval = restart;
  if (!sub420) {
    c.comp_info[0].h_samp_factor = 1;
    c.comp_info[0].v_samp_factor = 1;
  }
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW row = rgb + (size_t)c.next_scanline * w * 3;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  fclose(out);
  free(rgb);
}

static void cmd_coef(const char *path) {
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr err;
  d.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d);
  FILE *in = fopen(path, "rb");
  if (!in) die("open in");
  jpeg_stdio_src(&d, in);
  jpeg_read_header(&d, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&d);
  for (int ci = 0; ci < d.num_components; ci++) {
    jpeg_component_info *comp = &d.comp_info[ci];
    printf("component %d blocks %dx%d\n", ci,
           (int)comp->width_in_blocks, (int)comp->height_in_blocks);
    for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*d.mem->access_virt_barray)(
          (j_common_ptr)&d, coefs[ci], by, 1, FALSE);
      for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++) {
        printf("block %d %u %u:", ci, (unsigned)by, (unsigned)bx);
        for (int k = 0; k < 64; k++) printf(" %d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fclose(in);
}

static void cmd_dec(const char *path, const char *out_path) {
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr err;
  d.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d);
  FILE *in = fopen(path, "rb");
  if (!in) die("open in");
  jpeg_stdio_src(&d, in);
  jpeg_read_header(&d, TRUE);
  d.do_fancy_upsampling = FALSE; /* plain upsampling = repeat, like ours */
  jpeg_start_decompress(&d);
  FILE *out = fopen(out_path, "wb");
  if (!out) die("open out");
  fprintf(out, "P6\n%u %u\n255\n", d.output_width, d.output_height);
  unsigned char *row = malloc((size_t)d.output_width * d.output_components);
  while (d.output_scanline < d.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&d, &r, 1);
    if (d.output_components == 1)
      for (JDIMENSION x = 0; x < d.output_width; x++)
        fprintf(out, "%c%c%c", row[x], row[x], row[x]);
    else
      fwrite(row, 1, (size_t)d.output_width * 3, out);
  }
  free(row);
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fclose(in);
  fclose(out);
}

int main(int argc, char **argv) {
  if (argc < 3) die("usage: enc|coef|dec ...");
  if (!strcmp(argv[1], "enc") && argc >= 7) cmd_enc(argc, argv);
  else if (!strcmp(argv[1], "coef")) cmd_coef(argv[2]);
  else if (!strcmp(argv[1], "dec") && argc >= 4) cmd_dec(argv[2], argv[3]);
  else die("bad args");
  return 0;
}
