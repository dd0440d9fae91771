/* dump_yuv — tiny client of the reference decoder's public API, used only to
 * produce golden YUV output for bit-exactness tests of edge264_tpu.
 * Built by tools/ref_oracle.py against /root/reference/edge264.h.
 *
 * Usage: dump_yuv in.264 out.yuv [out2.yuv]
 * Writes every decoded frame's cropped Y, Cb, Cr planes concatenated to
 * out.yuv (and the second MVC view to out2.yuv if given).  Prints one line
 * per frame: "frame <id> <WxH_Y> <WxH_C>" and a final "end <n> <res>".
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <edge264.h>

static void write_view(FILE *f, const uint8_t *const s[3], const Edge264Frame *frm) {
	for (int p = 0; p < 3; p++) {
		int w = p ? frm->width_C : frm->width_Y;
		int h = p ? frm->height_C : frm->height_Y;
		int stride = p ? frm->stride_C : frm->stride_Y;
		int bytes = w << (p ? frm->bit_depth_C > 8 : frm->bit_depth_Y > 8);
		for (int y = 0; y < h; y++)
			fwrite(s[p] + (size_t)y * stride, 1, bytes, f);
	}
}

int main(int argc, char **argv) {
	if (argc < 3) { fprintf(stderr, "usage: dump_yuv in.264 out.yuv [out2.yuv]\n"); return 2; }
	FILE *in = fopen(argv[1], "rb");
	if (!in) { perror("open"); return 2; }
	fseek(in, 0, SEEK_END);
	long sz = ftell(in);
	fseek(in, 0, SEEK_SET);
	uint8_t *buf = malloc(sz + 16);
	if (fread(buf, 1, sz, in) != (size_t)sz) { perror("read"); return 2; }
	fclose(in);
	FILE *out = fopen(argv[2], "wb");
	FILE *out2 = argc > 3 ? fopen(argv[3], "wb") : NULL;

	Edge264Decoder *dec = edge264_alloc(0, NULL, NULL, 0, NULL, NULL, NULL);
	const uint8_t *end0 = buf + sz;
	const uint8_t *nal = buf;
	Edge264Frame frm;
	int n_frames = 0, res, stall = 0;
	if (sz >= 3)
		nal += 3 + (nal[2] == 0); /* skip leading 001 / 0001 */
	do {
		const uint8_t *end = edge264_find_start_code(nal, end0, 0);
		res = edge264_decode_NAL(dec, nal, end, NULL, NULL);
		stall++;
		while (!edge264_get_frame(dec, &frm, 0)) {
			stall = 0;
			write_view(out, frm.samples, &frm);
			if (out2 && frm.samples_mvc[0])
				write_view(out2, frm.samples_mvc, &frm);
			printf("frame %d %dx%d %dx%d\n", frm.FrameId,
			       frm.width_Y, frm.height_Y, frm.width_C, frm.height_C);
			n_frames++;
		}
		if (res != ENOBUFS)
			nal = end + 3;
		if (res == ENOBUFS && stall > 64)
			break; /* incomplete frames will never drain (e.g. lost slices) */
	} while (res == 0 || res == ENOBUFS);
	printf("end %d %d\n", n_frames, res);
	edge264_free(&dec);
	fclose(out);
	if (out2) fclose(out2);
	free(buf);
	return 0;
}
