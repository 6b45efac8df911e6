#!/bin/bash
# Build the native data-ingest library. JPEG support needs libjpeg dev
# headers; if (and ONLY if) those are absent the WAV fast path still
# builds (the loader falls back to PIL for images). Any OTHER compile
# error fails the build loudly — a silent wav-only fallback would mask
# jpegio.cc regressions forever (the jpeg tests skip when has_jpeg() is
# false, so CI would stay green with the jpeg path never compiled).
set -e
cd "$(dirname "$0")"
if g++ -O3 -shared -fPIC -std=c++17 -pthread -o libwavio.so wavio.cc jpegio.cc -ljpeg 2>jpeg_build.err; then
    rm -f jpeg_build.err
    echo "built $(pwd)/libwavio.so (wav + jpeg)"
elif grep -qiE "jpeglib\.h|cannot find -ljpeg" jpeg_build.err; then
    echo "libjpeg not available ($(head -1 jpeg_build.err)); building wav-only" >&2
    rm -f jpeg_build.err
    g++ -O3 -shared -fPIC -std=c++17 -pthread -o libwavio.so wavio.cc
    echo "built $(pwd)/libwavio.so (wav only)"
else
    echo "native build FAILED (not a missing-libjpeg case):" >&2
    cat jpeg_build.err >&2
    rm -f jpeg_build.err
    exit 1
fi
