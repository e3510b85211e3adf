/*
 * LD_PRELOAD shim: fixed per-request delay on parquet file IO — the DuckDB
 * proxy's half of the simulated object-store-latency bench regime (the
 * reference benchmark's `debug_fs_delay_mean_ms=3`; graft's half is
 * graft.sources.DelaySimFileSystem). Charges GRAFT_FS_DELAY_MS milliseconds
 * per open() of a *.parquet file and per pread()/read() call on its fd —
 * one "request" where an object store would charge a GET.
 *
 * Build: gcc -shared -fPIC -O2 -o fs_delay_shim.so fs_delay_shim.c -ldl
 * Use:   GRAFT_FS_DELAY_MS=3 LD_PRELOAD=./fs_delay_shim.so duckdb ...
 */
#define _GNU_SOURCE
#include <dlfcn.h>
#include <fcntl.h>
#include <stdarg.h>
#include <stdlib.h>
#include <string.h>
#include <sys/types.h>
#include <time.h>
#include <unistd.h>

#define MAX_FD 65536
static char tracked[MAX_FD];
/* next expected offset per fd: a pread starting there is a free sequential
 * continuation of the previous ranged GET; any jump charges one request
 * (same model as graft's DelaySimFileSystem). */
static long long next_off[MAX_FD];
static int delay_ms = -1;

static void dsleep(void) {
    if (delay_ms < 0) {
        const char *e = getenv("GRAFT_FS_DELAY_MS");
        delay_ms = e ? atoi(e) : 0;
    }
    if (delay_ms > 0) {
        struct timespec ts = {delay_ms / 1000, (long)(delay_ms % 1000) * 1000000L};
        nanosleep(&ts, NULL);
    }
}

static int is_parquet(const char *path) {
    size_t n = path ? strlen(path) : 0;
    return n > 8 && strcmp(path + n - 8, ".parquet") == 0;
}

static void note_fd(int fd, const char *path) {
    if (fd >= 0 && fd < MAX_FD) {
        tracked[fd] = (char)is_parquet(path);
        next_off[fd] = 0;
        if (tracked[fd]) dsleep(); /* the open itself is a request */
    }
}

typedef int (*open_fn)(const char *, int, ...);

int open(const char *path, int flags, ...) {
    static open_fn real = NULL;
    if (!real) real = (open_fn)dlsym(RTLD_NEXT, "open");
    mode_t mode = 0;
    if (flags & O_CREAT) {
        va_list ap; va_start(ap, flags); mode = (mode_t)va_arg(ap, int); va_end(ap);
    }
    int fd = real(path, flags, mode);
    note_fd(fd, path);
    return fd;
}

int open64(const char *path, int flags, ...) {
    static open_fn real = NULL;
    if (!real) real = (open_fn)dlsym(RTLD_NEXT, "open64");
    mode_t mode = 0;
    if (flags & O_CREAT) {
        va_list ap; va_start(ap, flags); mode = (mode_t)va_arg(ap, int); va_end(ap);
    }
    int fd = real(path, flags, mode);
    note_fd(fd, path);
    return fd;
}

ssize_t pread(int fd, void *buf, size_t count, off_t offset) {
    static ssize_t (*real)(int, void *, size_t, off_t) = NULL;
    if (!real) real = (ssize_t (*)(int, void *, size_t, off_t))dlsym(RTLD_NEXT, "pread");
    if (fd >= 0 && fd < MAX_FD && tracked[fd] && (long long)offset != next_off[fd]) dsleep();
    ssize_t r = real(fd, buf, count, offset);
    if (fd >= 0 && fd < MAX_FD && r > 0) next_off[fd] = (long long)offset + r;
    return r;
}

ssize_t pread64(int fd, void *buf, size_t count, off_t offset) {
    static ssize_t (*real)(int, void *, size_t, off_t) = NULL;
    if (!real) real = (ssize_t (*)(int, void *, size_t, off_t))dlsym(RTLD_NEXT, "pread64");
    if (fd >= 0 && fd < MAX_FD && tracked[fd] && (long long)offset != next_off[fd]) dsleep();
    ssize_t r = real(fd, buf, count, offset);
    if (fd >= 0 && fd < MAX_FD && r > 0) next_off[fd] = (long long)offset + r;
    return r;
}

/* sequential read(): always a continuation of the stream opened/positioned
 * by open/pread — the open itself already charged its request. */

int close(int fd) {
    static int (*real)(int) = NULL;
    if (!real) real = (int (*)(int))dlsym(RTLD_NEXT, "close");
    if (fd >= 0 && fd < MAX_FD) tracked[fd] = 0;
    return real(fd);
}
