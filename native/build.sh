#!/bin/bash
# Build the native data-ingest library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread -o libwavio.so wavio.cc jpegio.cc -ljpeg
echo "built $(pwd)/libwavio.so"
