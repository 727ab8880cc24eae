#!/bin/bash
# Build the native loader: native/libocr_loader.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    ocr_loader.cc \
    -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lpthread \
    -o libocr_loader.so
echo "built $(pwd)/libocr_loader.so"
