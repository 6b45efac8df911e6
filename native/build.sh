#!/bin/bash
# Build the native data-ingest library. JPEG support needs libjpeg dev
# headers; if they are absent the WAV fast path still builds (the loader
# falls back to PIL for images).
set -e
cd "$(dirname "$0")"
if g++ -O3 -shared -fPIC -std=c++17 -pthread -o libwavio.so wavio.cc jpegio.cc -ljpeg 2>jpeg_build.err; then
    rm -f jpeg_build.err
    echo "built $(pwd)/libwavio.so (wav + jpeg)"
else
    echo "libjpeg build failed ($(head -1 jpeg_build.err)); building wav-only" >&2
    rm -f jpeg_build.err
    g++ -O3 -shared -fPIC -std=c++17 -pthread -o libwavio.so wavio.cc
    echo "built $(pwd)/libwavio.so (wav only)"
fi
