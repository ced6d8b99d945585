// Baseline measurement driver: builds and searches the UNMODIFIED reference
// RoarGraph implementation (/root/reference, compiled via -I shims for the
// missing boost/robin-map headers) on the same synthetic dataset bench.py
// uses, so BASELINE.md can record a real CPU QPS number measured on this
// machine. This file is our own driver code (argument handling + timing +
// recall), intentionally minimal; the index code is the reference's.
//
// Usage:
//   bench_reference build  <base.fbin> <train.fbin> <knn.ibin> <index> \
//       <M_sq> <M_pjbp> <L_pjpq> <threads>
//   bench_reference search <base.fbin> <index> <eval.fbin> <gt.ibin> \
//       <k> <threads> <L1,L2,...>

#include <omp.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <set>
#include <string>
#include <vector>

#include "efanna2e/parameters.h"
#include "efanna2e/util.h"
#include "index_bipartite.h"

static std::vector<uint32_t> read_ibin(const char* path, uint32_t& n,
                                       uint32_t& k) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  fread(&n, 4, 1, f);
  fread(&k, 4, 1, f);
  std::vector<uint32_t> v((size_t)n * k);
  fread(v.data(), 4, v.size(), f);
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "mode?\n"); return 1; }
  std::string mode = argv[1];

  if (mode == "build") {
    const char *base_p = argv[2], *train_p = argv[3], *knn_p = argv[4],
               *index_p = argv[5];
    uint32_t M_sq = atoi(argv[6]), M_pjbp = atoi(argv[7]),
             L_pjpq = atoi(argv[8]), threads = atoi(argv[9]);
    unsigned base_n, base_d, sq_n, sq_d;
    float *data_bp = nullptr, *data_sq = nullptr;
    efanna2e::load_meta<float>(base_p, base_n, base_d);
    efanna2e::load_meta<float>(train_p, sq_n, sq_d);
    efanna2e::load_data<float>(base_p, base_n, base_d, data_bp);
    efanna2e::load_data<float>(train_p, sq_n, sq_d, data_sq);
    efanna2e::Parameters parameters;
    parameters.Set<uint32_t>("M_sq", M_sq);
    parameters.Set<uint32_t>("M_pjbp", M_pjbp);
    parameters.Set<uint32_t>("L_pjpq", L_pjpq);
    parameters.Set<uint32_t>("num_threads", threads);
    omp_set_num_threads(threads);
    efanna2e::IndexBipartite index(base_d, base_n + sq_n,
                                   efanna2e::INNER_PRODUCT, nullptr);
    index.LoadLearnBaseKNN(knn_p);
    auto t0 = std::chrono::high_resolution_clock::now();
    index.BuildRoarGraph(sq_n, data_sq, base_n, data_bp, parameters);
    auto t1 = std::chrono::high_resolution_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    index.SaveProjectionGraph(index_p);
    printf("BUILD_SECONDS %.2f\n", secs);
    return 0;
  }

  if (mode == "search") {
    const char *base_p = argv[2], *index_p = argv[3], *eval_p = argv[4],
               *gt_p = argv[5];
    uint32_t k = atoi(argv[6]), threads = atoi(argv[7]);
    std::vector<uint32_t> Ls;
    {
      char* tok = strtok(argv[8], ",");
      while (tok) { Ls.push_back(atoi(tok)); tok = strtok(nullptr, ","); }
    }
    unsigned q_n, q_d;
    float* qdata = nullptr;
    efanna2e::load_meta<float>(eval_p, q_n, q_d);
    efanna2e::load_data<float>(eval_p, q_n, q_d, qdata);
    float* q_aligned = efanna2e::data_align(qdata, q_n, q_d);
    uint32_t gt_n, gt_k;
    auto gt = read_ibin(gt_p, gt_n, gt_k);

    efanna2e::IndexBipartite index(q_d, 0, efanna2e::INNER_PRODUCT, nullptr);
    index.LoadSearchNeededData(base_p, "");
    index.LoadProjectionGraph(index_p);
    index.InitVisitedListPool(threads);
    omp_set_num_threads(threads);

    printf("L_pq,QPS,recall\n");
    for (uint32_t L : Ls) {
      efanna2e::Parameters sp;
      sp.Set<uint32_t>("L_pq", L);
      sp.Set<uint32_t>("num_threads", threads);
      std::vector<uint32_t> res((size_t)q_n * k);
      std::vector<std::vector<float>> res_d(q_n, std::vector<float>(k));
      // warmup, like the reference driver's 100-query pass
      for (size_t i = 0; i < std::min<size_t>(100, q_n); ++i) {
        size_t qi = i;
        index.SearchRoarGraph(q_aligned + i * q_d, k, qi, sp,
                              res.data() + i * k, res_d[i]);
      }
      auto t0 = std::chrono::high_resolution_clock::now();
#pragma omp parallel for schedule(dynamic, 1)
      for (size_t i = 0; i < q_n; ++i) {
        size_t qi = i;
        index.SearchRoarGraph(q_aligned + i * q_d, k, qi, sp,
                              res.data() + i * k, res_d[i]);
      }
      auto t1 = std::chrono::high_resolution_clock::now();
      double secs = std::chrono::duration<double>(t1 - t0).count();
      size_t hit = 0;
      for (size_t i = 0; i < q_n; ++i) {
        std::set<uint32_t> g(gt.begin() + i * gt_k,
                             gt.begin() + i * gt_k + k);
        for (size_t j = 0; j < k; ++j)
          hit += g.count(res[i * k + j]);
      }
      printf("%u,%.1f,%.4f\n", L, q_n / secs,
             (double)hit / ((double)q_n * k));
      fflush(stdout);
    }
    return 0;
  }
  fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 1;
}
