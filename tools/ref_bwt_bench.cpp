// Times the reference's BWT stage alone (forward divsufsort+emission and
// anchored inverse) by linking against the reference sources built as-is.
// Build (out of tree):
//   g++ -std=c++14 -fopenmp -O3 -w -D'__min(a,b)=...' -D'__max(a,b)=...' \
//     tools/ref_bwt_bench.cpp /root/reference/bwt.cpp \
//     /root/reference/divsufsort.cpp /root/reference/sys_detect.cpp \
//     /root/reference/format.cpp -I/root/reference -o build/ref_bwt_bench
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "bwt.hpp"

int main(int argc, char** argv) {
  int mb = argc > 1 ? atoi(argv[1]) : 8;
  int threads = argc > 2 ? atoi(argv[2]) : 1;
  size_t n = size_t(mb) << 20;
  unsigned char* in = (unsigned char*)malloc(n + 4096);
  unsigned char* mid = (unsigned char*)malloc(n + 4096);
  unsigned char* out = (unsigned char*)malloc(n + 4096);
  // text-like synthetic data
  unsigned int x = 12345;
  for (size_t i = 0; i < n; i++) {
    x = x * 1103515245 + 12345;
    in[i] = " etaoinshrdlucmfwypvbgkqjxz.,\n"[(x >> 16) % 30];
  }
  int isize = int(n), msize = 0, osize = 0;
  Buffer bin{in, &isize}, bmid{mid, &msize}, bout{out, &osize};
  Options opt{};
  opt.Threads = threads;
  opt.Gpu = false;
  BlockSort::Bwt bwt;

  auto t0 = std::chrono::steady_clock::now();
  bwt.ForwardBwt(bin, bmid);
  auto t1 = std::chrono::steady_clock::now();
  bwt.InverseBwt(bmid, bout, opt);
  auto t2 = std::chrono::steady_clock::now();

  if (memcmp(in, out, n) != 0) { printf("MISMATCH\n"); return 1; }
  double fe = std::chrono::duration<double>(t1 - t0).count();
  double fi = std::chrono::duration<double>(t2 - t1).count();
  printf("fwd %.3f s (%.1f MB/s)  inv %.3f s (%.1f MB/s)  combined %.4f GB/s\n",
         fe, n / 1e6 / fe, fi, n / 1e6 / fi, 2 * n / 1e9 / (fe + fi));
  return 0;
}
