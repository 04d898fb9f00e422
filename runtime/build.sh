#!/bin/sh
# Build the native env pool shared library.
#
# DFD_MARCH picks the target microarchitecture: in-place source builds
# default to `native`; distributable wheel builds (setup.py) pass a generic
# baseline so the wheel does not SIGILL on an older CPU than the build host.
set -e
cd "$(dirname "$0")"
MARCH="${DFD_MARCH:-native}"
g++ -O3 -march="$MARCH" -std=c++17 -shared -fPIC -pthread -o libdfd_envpool.so envpool.cc
echo "built $(pwd)/libdfd_envpool.so (-march=$MARCH)"
