// Native host dataplane: folder-tree manifest scanning, .npy mask loading and
// proxy-batch assembly.
//
// Role: the reference's de-facto runtime is filesystem walking + per-file
// numpy/JSON IO executed from the Python loop (os.listdir trees at
// Python/Soccer/PlayerReconstruction/player_recon.py:1094-1140, np.load /
// json.load per view at :1141-1146). This library provides that dataplane as
// native code with a C ABI (ctypes-friendly): recursive manifest scans, a
// zero-copy .npy parser, a minimal JSON keypoint parser and multi-threaded
// proxy-batch assembly that fills caller-provided pinned buffers, so the
// Python layer only orchestrates and the TPU feed never blocks on the
// interpreter.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>

namespace {

bool is_dir(const std::string &path) {
  struct stat st;
  return stat(path.c_str(), &st) == 0 && S_ISDIR(st.st_mode);
}

void sorted_entries(const std::string &dir, std::vector<std::string> *out) {
  out->clear();
  DIR *d = opendir(dir.c_str());
  if (!d) return;
  while (dirent *e = readdir(d)) {
    if (e->d_name[0] == '.') continue;
    out->push_back(e->d_name);
  }
  closedir(d);
  std::sort(out->begin(), out->end());
}

bool ends_with(const std::string &s, const std::string &suffix) {
  return s.size() >= suffix.size() &&
         s.compare(s.size() - suffix.size(), suffix.size(), suffix) == 0;
}

// ---------------------------------------------------------------------------
// .npy parsing (v1.0/2.0 headers, C-order, little-endian)
// ---------------------------------------------------------------------------

struct NpyInfo {
  char dtype;        // 'u' uint8, 'f' float32, 'd' float64, 'i' int64/
  int itemsize;
  std::vector<int64_t> shape;
  size_t data_offset;
};

bool parse_npy_header(FILE *f, NpyInfo *info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  // descr
  size_t dpos = header.find("'descr'");
  if (dpos == std::string::npos) return false;
  size_t q1 = header.find('\'', dpos + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "|u1" || descr == "|b1") { info->dtype = 'u'; info->itemsize = 1; }
  else if (descr == "<f4") { info->dtype = 'f'; info->itemsize = 4; }
  else if (descr == "<f8") { info->dtype = 'd'; info->itemsize = 8; }
  else if (descr == "<i8") { info->dtype = 'i'; info->itemsize = 8; }
  else if (descr == "<i4") { info->dtype = 'j'; info->itemsize = 4; }
  else return false;

  // fortran_order must be False
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  // shape
  size_t spos = header.find("'shape'");
  size_t p1 = header.find('(', spos);
  size_t p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  info->shape.clear();
  const char *p = shape_s.c_str();
  while (*p) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    info->shape.push_back(strtoll(p, const_cast<char **>(&p), 10));
  }
  return true;
}

}  // namespace

extern "C" {

// Recursive manifest scan: newline-separated relative paths of files ending
// with `suffix`, under depth-first sorted traversal. Caller frees with
// dp_free. Returns nullptr on error.
char *dp_scan_tree(const char *root, const char *suffix) {
  std::string out;
  std::vector<std::string> stack = {""};
  std::string suf = suffix ? suffix : "";
  std::vector<std::string> entries;

  // explicit DFS keeping deterministic (sorted) order
  std::vector<std::string> pending = {""};
  while (!pending.empty()) {
    std::string rel = pending.front();
    pending.erase(pending.begin());
    std::string full = std::string(root) + (rel.empty() ? "" : "/" + rel);
    sorted_entries(full, &entries);
    std::vector<std::string> dirs;
    for (const auto &name : entries) {
      std::string child_rel = rel.empty() ? name : rel + "/" + name;
      std::string child_full = std::string(root) + "/" + child_rel;
      if (is_dir(child_full)) {
        dirs.push_back(child_rel);
      } else if (suf.empty() || ends_with(name, suf)) {
        out += child_rel;
        out += '\n';
      }
    }
    // insert dirs at the front preserving order → DFS-ish deterministic
    pending.insert(pending.begin(), dirs.begin(), dirs.end());
  }
  char *buf = static_cast<char *>(malloc(out.size() + 1));
  memcpy(buf, out.c_str(), out.size() + 1);
  return buf;
}

void dp_free(void *p) { free(p); }

// Load a 2-D .npy (uint8 or float32/float64) as float32 into out (size
// out_len floats). Returns 0 on success and writes shape to dims[2].
int dp_load_npy_f32(const char *path, float *out, int64_t out_len,
                    int64_t *dims) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.shape.size() > 2) {
    fclose(f);
    return -2;
  }
  int64_t rows = info.shape.empty() ? 1 : info.shape[0];
  int64_t cols = info.shape.size() < 2 ? 1 : info.shape[1];
  int64_t n = rows * cols;
  if (n > out_len) {
    fclose(f);
    return -3;
  }
  fseek(f, static_cast<long>(info.data_offset), SEEK_SET);
  std::vector<unsigned char> raw(n * info.itemsize);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -4;
  }
  fclose(f);
  switch (info.dtype) {
    case 'u':
      for (int64_t i = 0; i < n; ++i) out[i] = raw[i];
      break;
    case 'f':
      memcpy(out, raw.data(), n * 4);
      break;
    case 'd': {
      const double *src = reinterpret_cast<const double *>(raw.data());
      for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(src[i]);
      break;
    }
    case 'i': {
      const int64_t *src = reinterpret_cast<const int64_t *>(raw.data());
      for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(src[i]);
      break;
    }
    case 'j': {
      const int32_t *src = reinterpret_cast<const int32_t *>(raw.data());
      for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(src[i]);
      break;
    }
    default:
      return -5;
  }
  dims[0] = rows;
  dims[1] = cols;
  return 0;
}

// Parse a JSON keypoint file: nested arrays of numbers ([[x, y, s], ...]),
// writing up to out_len floats in reading order. Returns count or <0.
int dp_load_json_floats(const char *path, float *out, int64_t out_len) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string text(size, '\0');
  if (fread(&text[0], 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -2;
  }
  fclose(f);
  int64_t count = 0;
  const char *p = text.c_str();
  const char *end = p + size;
  while (p < end && count < out_len) {
    if ((*p >= '0' && *p <= '9') || *p == '-' || *p == '+') {
      char *next;
      double v = strtod(p, &next);
      out[count++] = static_cast<float>(v);
      p = next;
    } else {
      ++p;
    }
  }
  return static_cast<int>(count);
}

// Threaded proxy-batch assembly: for B players, load <stem>_sil.npy into
// sil_out (B*wh*wh f32) and <stem>_j2d.xml into j2d_out (B*17*3 f32).
// stems: concatenated NUL-separated path stems. Returns 0 on success,
// else the (1-based) index of the first failing stem negated.
int dp_load_proxy_batch(const char *stems, int64_t batch, int64_t wh,
                        float *sil_out, float *j2d_out, int n_threads) {
  std::vector<const char *> stem_ptrs;
  const char *p = stems;
  for (int64_t i = 0; i < batch; ++i) {
    stem_ptrs.push_back(p);
    p += strlen(p) + 1;
  }
  std::vector<int> status(batch, 0);

  auto work = [&](int64_t begin, int64_t step) {
    int64_t dims[2];
    for (int64_t i = begin; i < batch; i += step) {
      std::string stem = stem_ptrs[i];
      int rc = dp_load_npy_f32((stem + "_sil.npy").c_str(),
                               sil_out + i * wh * wh, wh * wh, dims);
      if (rc != 0 || dims[0] != wh || dims[1] != wh) {
        status[i] = 1;
        continue;
      }
      int n = dp_load_json_floats((stem + "_j2d.xml").c_str(),
                                  j2d_out + i * 17 * 3, 17 * 3);
      if (n < 17 * 2) status[i] = 2;
    }
  };

  if (n_threads <= 1 || batch <= 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> threads;
    int t_count = std::min<int64_t>(n_threads, batch);
    for (int t = 0; t < t_count; ++t)
      threads.emplace_back(work, t, t_count);
    for (auto &t : threads) t.join();
  }
  for (int64_t i = 0; i < batch; ++i)
    if (status[i]) return -static_cast<int>(i + 1);
  return 0;
}

}  // extern "C"
