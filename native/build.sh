#!/bin/sh
# Build the native host-data-path library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libsegment_gather.so segment_gather.cpp -lpthread
echo "built native/libsegment_gather.so"
