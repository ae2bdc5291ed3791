// Standalone profiling harness for the native hot paths (decode + both
// clustering passes), built by tools/build_prof.sh with -pg for gprof.
// Input: a BAM path plus /tmp/profdump/inputs.bin written by the dump
// script (flat named arrays: hit SoA + packed refs). Runs everything
// single-threaded so gprof attribution is clean.
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

using i32 = int32_t;
using i64 = int64_t;

extern "C" {
struct StrawbBam;
StrawbBam* strawb_bam_load(const char* path, i32 max_intron, i32 min_intron,
                           i32 use_unique, i32 fr, i32 rf, i32 keep_seq,
                           i32 min_mapq, i32 n_threads);
void strawb_bam_free(StrawbBam*);
int64_t strawb_bam_num_hits(StrawbBam*);
struct StrawbClusters;
StrawbClusters* strawb_cluster_run(
    i64 n, const i32* ref_id, const i64* left, const i64* right,
    const int8_t* strand, const uint16_t* flag, const i32* mate_ref,
    const i64* mate_pos, const i32* nh, const uint64_t* read_id,
    const uint64_t* cigar_hash, const i64* feat_off, const int8_t* feat_code,
    const i64* feat_left, const i32* feat_len, i64 nref, const i32* rref_id,
    const i64* rleft, const i64* rright, const i32* rgene,
    const int8_t* rstrand, i64 max_olap_dist, i64 max_intron_length,
    i64 max_frag_span, i32 enforce_ref_models, i32 utilize_ref_models,
    i32 min_read_for_assemb, i32 mode);
void strawb_cluster_free(StrawbClusters*);
i64 strawb_cluster_n(StrawbClusters*);
}

struct Blob {
  std::vector<uint8_t> bytes;
  template <typename T>
  const T* as() const { return reinterpret_cast<const T*>(bytes.data()); }
};

static std::map<std::string, Blob> load_dump(const char* path) {
  std::map<std::string, Blob> m;
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "no dump %s\n", path); exit(1); }
  i32 nnames = 0;
  if (fread(&nnames, 4, 1, f) != 1) exit(1);
  for (i32 i = 0; i < nnames; ++i) {
    i32 ln = 0;
    if (fread(&ln, 4, 1, f) != 1) exit(1);
    std::string name(ln, 0);
    if (fread(&name[0], 1, ln, f) != (size_t)ln) exit(1);
    i64 nb = 0;
    if (fread(&nb, 8, 1, f) != 1) exit(1);
    Blob b;
    b.bytes.resize(nb);
    if (nb && fread(b.bytes.data(), 1, nb, f) != (size_t)nb) exit(1);
    m.emplace(std::move(name), std::move(b));
  }
  fclose(f);
  return m;
}

int main(int argc, char** argv) {
  const char* bam = argc > 1 ? argv[1]
      : "/tmp/strawberry_bench_500000/sample_01.sorted.bam";
  const char* dump = argc > 2 ? argv[2] : "/tmp/profdump/inputs.bin";
  int reps = argc > 3 ? atoi(argv[3]) : 1;
  auto now = [] {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
  };

  double t0 = now();
  StrawbBam* h = nullptr;
  for (int r = 0; r < reps; ++r) {
    if (h) strawb_bam_free(h);
    h = strawb_bam_load(bam, 300000, 20, 0, 0, 0, 0, 0, 1);
  }
  fprintf(stderr, "decode: %.3fs/rep (%lld hits)\n", (now() - t0) / reps,
          (long long)strawb_bam_num_hits(h));
  strawb_bam_free(h);

  auto m = load_dump(dump);
  i64 n = (i64)(m["left"].bytes.size() / 8);
  i64 nref = (i64)(m["rleft"].bytes.size() / 8);
  for (int mode = 0; mode <= 1; ++mode) {
    double t1 = now();
    i64 ncl = 0;
    for (int r = 0; r < reps; ++r) {
      StrawbClusters* c = strawb_cluster_run(
          n, m["ref_id"].as<i32>(), m["left"].as<i64>(),
          m["right"].as<i64>(), m["strand"].as<int8_t>(),
          m["flag"].as<uint16_t>(), m["mate_ref"].as<i32>(),
          m["mate_pos"].as<i64>(), m["nh"].as<i32>(),
          m["read_id"].as<uint64_t>(), m["cigar_hash"].as<uint64_t>(),
          m["feat_off"].as<i64>(), m["feat_code"].as<int8_t>(),
          m["feat_left"].as<i64>(), m["feat_len"].as<i32>(), nref,
          m["rref"].as<i32>(), m["rleft"].as<i64>(), m["rright"].as<i64>(),
          m["rgene"].as<i32>(), m["rstrand"].as<int8_t>(),
          /*max_olap_dist=*/50, /*max_intron=*/300000,
          /*max_frag_span=*/1000000, /*enforce=*/0, /*utilize=*/1,
          /*min_read_for_assemb=*/5, mode);
      ncl = strawb_cluster_n(c);
      strawb_cluster_free(c);
    }
    fprintf(stderr, "cluster mode=%d: %.3fs/rep (%lld clusters)\n", mode,
            (now() - t1) / reps, (long long)ncl);
  }
  return 0;
}
