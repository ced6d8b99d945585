// Native host-side runtime: index (de)serialization and adjacency packing.
//
// TPU-native counterpart of the reference's C++ persistence layer
// (reference src/index_bipartite.cpp:2606-2619 SaveProjectionGraph,
// :2097-2117 LoadProjectionGraph, :2045-2071 bipartite Save/Load) and of
// its aligned loaders (include/efanna2e/util.h:180-211): the device wants
// dense sentinel-padded int32 adjacency, the disk format is ragged
// [deg][ids...] — these loops are pure pointer arithmetic and belong in
// C++, not Python (a 10M-node save is ~10M tiny writes).
//
// Exposed as a C ABI for ctypes. All functions return 0 on success,
// negative errno-style codes on failure.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---- fbin/ibin -------------------------------------------------------------

int msann_read_header(const char* path, uint32_t* n, uint32_t* d) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  int ok = fread(n, 4, 1, f) == 1 && fread(d, 4, 1, f) == 1;
  fclose(f);
  return ok ? 0 : -EIO;
}

// ---- projection graph ------------------------------------------------------

// Save: [ep u32][npts u32] then per node [deg u32][ids u32...].
// neighbors: int32 [n, m_pad] with sentinel >= n marking padding.
int msann_save_projection(const char* path, uint32_t ep, uint32_t n,
                          const int32_t* neighbors, uint32_t m_pad) {
  FILE* f = fopen(path, "wb");
  if (!f) return -errno;
  setvbuf(f, nullptr, _IOFBF, 1 << 22);
  if (fwrite(&ep, 4, 1, f) != 1 || fwrite(&n, 4, 1, f) != 1) {
    fclose(f);
    return -EIO;
  }
  std::vector<uint32_t> row(m_pad);
  for (uint32_t i = 0; i < n; ++i) {
    const int32_t* src = neighbors + (size_t)i * m_pad;
    uint32_t deg = 0;
    for (uint32_t j = 0; j < m_pad; ++j) {
      if (src[j] >= 0 && (uint32_t)src[j] < n) row[deg++] = (uint32_t)src[j];
    }
    if (fwrite(&deg, 4, 1, f) != 1 ||
        (deg && fwrite(row.data(), 4, deg, f) != deg)) {
      fclose(f);
      return -EIO;
    }
  }
  fclose(f);
  return 0;
}

// Load pass 1: scan the ragged payload for (npts, max_degree).
int msann_scan_projection(const char* path, uint32_t* ep, uint32_t* n,
                          uint32_t* max_deg, int64_t* payload_words) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  if (fread(ep, 4, 1, f) != 1 || fread(n, 4, 1, f) != 1) {
    fclose(f);
    return -EIO;
  }
  uint32_t md = 0;
  int64_t words = 0;
  for (uint32_t i = 0; i < *n; ++i) {
    uint32_t deg;
    if (fread(&deg, 4, 1, f) != 1) { fclose(f); return -EIO; }
    if (deg > md) md = deg;
    if (fseek(f, (long)deg * 4, SEEK_CUR) != 0) { fclose(f); return -EIO; }
    words += 1 + deg;
  }
  // reject trailing bytes (same check the Python loader applies)
  long pos = ftell(f);
  fseek(f, 0, SEEK_END);
  if (ftell(f) != pos) { fclose(f); return -EINVAL; }
  *max_deg = md;
  *payload_words = words;
  fclose(f);
  return 0;
}

// Load pass 2: fill the padded adjacency (caller allocates [n, m_pad]).
int msann_load_projection(const char* path, int32_t* neighbors, uint32_t n,
                          uint32_t m_pad) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  setvbuf(f, nullptr, _IOFBF, 1 << 22);
  fseek(f, 8, SEEK_SET);
  std::vector<uint32_t> row;
  for (uint32_t i = 0; i < n; ++i) {
    uint32_t deg;
    if (fread(&deg, 4, 1, f) != 1) { fclose(f); return -EIO; }
    row.resize(deg);
    if (deg && fread(row.data(), 4, deg, f) != deg) {
      fclose(f);
      return -EIO;
    }
    int32_t* dst = neighbors + (size_t)i * m_pad;
    uint32_t take = deg < m_pad ? deg : m_pad;
    for (uint32_t j = 0; j < take; ++j) dst[j] = (int32_t)row[j];
    for (uint32_t j = take; j < m_pad; ++j) dst[j] = (int32_t)n;
  }
  fclose(f);
  return 0;
}

// ---- bipartite graph (format: [total u32] + per node [deg][ids...]) --------

int msann_save_bipartite(const char* path, uint32_t n_total,
                         const int32_t* neighbors, uint32_t m_pad) {
  FILE* f = fopen(path, "wb");
  if (!f) return -errno;
  setvbuf(f, nullptr, _IOFBF, 1 << 22);
  if (fwrite(&n_total, 4, 1, f) != 1) { fclose(f); return -EIO; }
  std::vector<uint32_t> row(m_pad);
  for (uint32_t i = 0; i < n_total; ++i) {
    const int32_t* src = neighbors + (size_t)i * m_pad;
    uint32_t deg = 0;
    for (uint32_t j = 0; j < m_pad; ++j) {
      if (src[j] >= 0 && (uint32_t)src[j] < n_total)
        row[deg++] = (uint32_t)src[j];
    }
    if (fwrite(&deg, 4, 1, f) != 1 ||
        (deg && fwrite(row.data(), 4, deg, f) != deg)) {
      fclose(f);
      return -EIO;
    }
  }
  fclose(f);
  return 0;
}

int msann_scan_bipartite(const char* path, uint32_t* n_total,
                         uint32_t* max_deg) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  if (fread(n_total, 4, 1, f) != 1) { fclose(f); return -EIO; }
  uint32_t md = 0;
  for (uint32_t i = 0; i < *n_total; ++i) {
    uint32_t deg;
    if (fread(&deg, 4, 1, f) != 1) { fclose(f); return -EIO; }
    if (deg > md) md = deg;
    if (fseek(f, (long)deg * 4, SEEK_CUR) != 0) { fclose(f); return -EIO; }
  }
  long pos = ftell(f);
  fseek(f, 0, SEEK_END);
  if (ftell(f) != pos) { fclose(f); return -EINVAL; }
  *max_deg = md;
  fclose(f);
  return 0;
}

int msann_load_bipartite(const char* path, int32_t* neighbors,
                         uint32_t n_total, uint32_t m_pad) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  setvbuf(f, nullptr, _IOFBF, 1 << 22);
  fseek(f, 4, SEEK_SET);
  std::vector<uint32_t> row;
  for (uint32_t i = 0; i < n_total; ++i) {
    uint32_t deg;
    if (fread(&deg, 4, 1, f) != 1) { fclose(f); return -EIO; }
    row.resize(deg);
    if (deg && fread(row.data(), 4, deg, f) != deg) {
      fclose(f);
      return -EIO;
    }
    int32_t* dst = neighbors + (size_t)i * m_pad;
    uint32_t take = deg < m_pad ? deg : m_pad;
    for (uint32_t j = 0; j < take; ++j) dst[j] = (int32_t)row[j];
    for (uint32_t j = take; j < m_pad; ++j) dst[j] = (int32_t)n_total;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
