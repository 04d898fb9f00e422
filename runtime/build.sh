#!/bin/sh
# Build the native env pool shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread -o libdfd_envpool.so envpool.cc
echo "built $(pwd)/libdfd_envpool.so"
