/* Stub librtlsdr for unit-testing the ctypes device source
 * (dump1090_tpu/io/rtlsdr.py) without USB hardware.
 *
 * rtlsdr_read_async replays the file named by $RTLSDR_STUB_DATA through the
 * callback in buflen-sized chunks — the same geometry librtlsdr uses
 * (reference reader: dump1090.c:516-527).  Build:
 *   gcc -shared -fPIC tests/stub_rtlsdr.c -o <dir>/librtlsdr_stub.so
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len, void *ctx);

static volatile int canceled = 0;
static int last_gain = 0;

uint32_t rtlsdr_get_device_count(void) { return 1; }

int rtlsdr_get_device_usb_strings(uint32_t index, char *vendor, char *product,
                                  char *serial) {
    (void)index;
    strcpy(vendor, "StubVendor");
    strcpy(product, "StubProduct");
    strcpy(serial, "00000001");
    return 0;
}

int rtlsdr_open(void **dev, uint32_t index) { (void)index; *dev = (void *)1; return 0; }
int rtlsdr_set_tuner_gain_mode(void *dev, int mode) { (void)dev; (void)mode; return 0; }
int rtlsdr_get_tuner_gains(void *dev, int *gains) {
    (void)dev;
    gains[0] = 90; gains[1] = 250; gains[2] = 496;
    return 3;
}
int rtlsdr_set_tuner_gain(void *dev, int gain) { (void)dev; last_gain = gain; return 0; }
int rtlsdr_get_tuner_gain(void *dev) { (void)dev; return last_gain; }
int rtlsdr_set_freq_correction(void *dev, int ppm) { (void)dev; (void)ppm; return 0; }
int rtlsdr_set_agc_mode(void *dev, int on) { (void)dev; (void)on; return 0; }
int rtlsdr_set_center_freq(void *dev, uint32_t freq) { (void)dev; (void)freq; return 0; }
int rtlsdr_set_sample_rate(void *dev, uint32_t rate) { (void)dev; (void)rate; return 0; }
int rtlsdr_reset_buffer(void *dev) { (void)dev; return 0; }

int rtlsdr_read_async(void *dev, rtlsdr_read_async_cb_t cb, void *ctx,
                      uint32_t buf_num, uint32_t buf_len) {
    (void)dev; (void)buf_num;
    canceled = 0;  /* the .so is loaded once per process; arm each session */
    const char *path = getenv("RTLSDR_STUB_DATA");
    /* emulate the radio's pacing (real hardware delivers 256 KiB per 65 ms;
     * a free-running replay would exercise only the overwrite path) */
    const char *d = getenv("RTLSDR_STUB_DELAY_US");
    useconds_t delay = d ? (useconds_t)atoi(d) : 0;
    if (!path) return -1;
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char *buf = (unsigned char *)malloc(buf_len);
    size_t n = 0;
    while (!canceled && (n = fread(buf, 1, buf_len, f)) == buf_len) {
        if (delay) usleep(delay);
        cb(buf, (uint32_t)n, ctx);
    }
    if (!canceled && n > 0) {  /* trailing short transfer */
        if (delay) usleep(delay);
        cb(buf, (uint32_t)n, ctx);
    }
    free(buf);
    fclose(f);
    return 0;
}

int rtlsdr_cancel_async(void *dev) { (void)dev; canceled = 1; return 0; }
int rtlsdr_close(void *dev) { (void)dev; return 0; }
