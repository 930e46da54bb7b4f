// Native host-side epoch tiler for fusion4landslide_tpu.
//
// Role parity with the reference's native tiling core
// (cpp_core/pcd_tiling/pcd_tiling.cpp, a PCL/SWIG module): read two PLY
// epochs, crop to their bounding-box overlap, recursively bisect the
// in-plane axes at box midpoints until every tile holds at most
// max_pts points, and write per-tile core + halo PLYs
// (non_overlap/{source,target}_tile_N.ply, overlap/..._overlap.ply with a
// +/-20 m in-plane halo).
//
// Unlike the reference this is a pure streaming runtime component: no PCL,
// no SWIG — memory-mapped input, index-set recursion, raw binary writes —
// exposed through a C ABI consumed via ctypes
// (fusion4landslide_tpu/tiling/native.py). All geometry *compute*
// (voxel filters, searches, supervoxels) lives on the TPU instead.
//
// Build: see cpp/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Cloud {
  std::vector<double> xyz;   // 3 * n
  std::vector<uint8_t> rgb;  // 3 * n or empty
  size_t n = 0;
};

struct Prop {
  std::string name;
  int size;      // bytes
  char kind;     // 'f' float, 'i' int, 'u' uint
};

int prop_size(const std::string& t, char* kind) {
  if (t == "float" || t == "float32") { *kind = 'f'; return 4; }
  if (t == "double" || t == "float64") { *kind = 'f'; return 8; }
  if (t == "char" || t == "int8") { *kind = 'i'; return 1; }
  if (t == "uchar" || t == "uint8") { *kind = 'u'; return 1; }
  if (t == "short" || t == "int16") { *kind = 'i'; return 2; }
  if (t == "ushort" || t == "uint16") { *kind = 'u'; return 2; }
  if (t == "int" || t == "int32") { *kind = 'i'; return 4; }
  if (t == "uint" || t == "uint32") { *kind = 'u'; return 4; }
  return -1;
}

double read_scalar(const uint8_t* p, const Prop& pr) {
  if (pr.kind == 'f') {
    if (pr.size == 4) { float v; std::memcpy(&v, p, 4); return v; }
    double v; std::memcpy(&v, p, 8); return v;
  }
  int64_t iv = 0;
  std::memcpy(&iv, p, pr.size);  // little-endian host assumed
  return static_cast<double>(iv);
}

// Read a binary_little_endian or ascii PLY vertex element.
bool read_ply(const std::string& path, Cloud* out, std::string* err) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) { *err = "cannot open " + path; return false; }
  struct stat st;
  fstat(fd, &st);
  size_t len = static_cast<size_t>(st.st_size);
  const uint8_t* base = static_cast<const uint8_t*>(
      mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) { *err = "mmap failed"; return false; }

  // Parse header lines.
  size_t pos = 0;
  auto next_line = [&](std::string* line) {
    size_t start = pos;
    while (pos < len && base[pos] != '\n') pos++;
    line->assign(reinterpret_cast<const char*>(base + start), pos - start);
    if (!line->empty() && line->back() == '\r') line->pop_back();
    if (pos < len) pos++;
    return start < len;
  };
  std::string line;
  next_line(&line);
  if (line != "ply") { *err = "not a PLY file"; munmap((void*)base, len); return false; }
  bool binary = false, ok_format = false;
  size_t n_vertex = 0;
  std::vector<Prop> props;
  bool in_vertex = false;
  while (next_line(&line)) {
    if (line.rfind("format", 0) == 0) {
      binary = line.find("binary_little_endian") != std::string::npos;
      ok_format = binary || line.find("ascii") != std::string::npos;
    } else if (line.rfind("element", 0) == 0) {
      in_vertex = line.find("vertex") != std::string::npos;
      if (in_vertex) n_vertex = std::stoull(line.substr(line.rfind(' ') + 1));
    } else if (line.rfind("property", 0) == 0 && in_vertex) {
      char kind;
      size_t sp1 = line.find(' '), sp2 = line.find(' ', sp1 + 1);
      std::string type = line.substr(sp1 + 1, sp2 - sp1 - 1);
      std::string name = line.substr(line.rfind(' ') + 1);
      int size = prop_size(type, &kind);
      if (size < 0) { *err = "unsupported property type " + type; munmap((void*)base, len); return false; }
      props.push_back({name, size, kind});
    } else if (line == "end_header") {
      break;
    }
  }
  if (!ok_format) { *err = "unsupported PLY format"; munmap((void*)base, len); return false; }

  int stride = 0, off_x = -1, off_y = -1, off_z = -1;
  int off_r = -1, off_g = -1, off_b = -1;
  int ix = -1, iy = -1, iz = -1, ir = -1, ig = -1, ib = -1;
  for (size_t i = 0; i < props.size(); ++i) {
    if (props[i].name == "x") { off_x = stride; ix = (int)i; }
    if (props[i].name == "y") { off_y = stride; iy = (int)i; }
    if (props[i].name == "z") { off_z = stride; iz = (int)i; }
    if (props[i].name == "red") { off_r = stride; ir = (int)i; }
    if (props[i].name == "green") { off_g = stride; ig = (int)i; }
    if (props[i].name == "blue") { off_b = stride; ib = (int)i; }
    stride += props[i].size;
  }
  if (off_x < 0 || off_y < 0 || off_z < 0) {
    *err = "vertex element lacks x/y/z"; munmap((void*)base, len); return false;
  }
  bool has_rgb = off_r >= 0 && off_g >= 0 && off_b >= 0;

  out->n = n_vertex;
  out->xyz.resize(3 * n_vertex);
  if (has_rgb) out->rgb.resize(3 * n_vertex);

  if (binary) {
    const uint8_t* data = base + pos;
    if (pos + n_vertex * (size_t)stride > len) {
      *err = "truncated PLY payload"; munmap((void*)base, len); return false;
    }
    for (size_t i = 0; i < n_vertex; ++i) {
      const uint8_t* rec = data + i * stride;
      out->xyz[3 * i + 0] = read_scalar(rec + off_x, props[ix]);
      out->xyz[3 * i + 1] = read_scalar(rec + off_y, props[iy]);
      out->xyz[3 * i + 2] = read_scalar(rec + off_z, props[iz]);
      if (has_rgb) {
        out->rgb[3 * i + 0] = (uint8_t)read_scalar(rec + off_r, props[ir]);
        out->rgb[3 * i + 1] = (uint8_t)read_scalar(rec + off_g, props[ig]);
        out->rgb[3 * i + 2] = (uint8_t)read_scalar(rec + off_b, props[ib]);
      }
    }
  } else {
    // ascii payload
    std::string tok;
    const char* p = reinterpret_cast<const char*>(base + pos);
    const char* end = reinterpret_cast<const char*>(base + len);
    for (size_t i = 0; i < n_vertex; ++i) {
      std::vector<double> vals(props.size());
      for (size_t j = 0; j < props.size(); ++j) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r')) p++;
        char* endp = nullptr;
        vals[j] = strtod(p, &endp);
        p = endp;
      }
      out->xyz[3 * i + 0] = vals[ix];
      out->xyz[3 * i + 1] = vals[iy];
      out->xyz[3 * i + 2] = vals[iz];
      if (has_rgb) {
        out->rgb[3 * i + 0] = (uint8_t)vals[ir];
        out->rgb[3 * i + 1] = (uint8_t)vals[ig];
        out->rgb[3 * i + 2] = (uint8_t)vals[ib];
      }
    }
  }
  munmap((void*)base, len);
  return true;
}

bool write_ply(const std::string& path, const Cloud& cloud,
               const std::vector<uint32_t>& idx) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  bool rgb = !cloud.rgb.empty();
  fprintf(f,
          "ply\nformat binary_little_endian 1.0\nelement vertex %zu\n"
          "property double x\nproperty double y\nproperty double z\n",
          idx.size());
  if (rgb)
    fprintf(f, "property uchar red\nproperty uchar green\nproperty uchar blue\n");
  fprintf(f, "end_header\n");
  std::vector<uint8_t> rec(24 + (rgb ? 3 : 0));
  for (uint32_t i : idx) {
    std::memcpy(rec.data(), &cloud.xyz[3 * (size_t)i], 24);
    if (rgb) std::memcpy(rec.data() + 24, &cloud.rgb[3 * (size_t)i], 3);
    fwrite(rec.data(), 1, rec.size(), f);
  }
  fclose(f);
  return true;
}

struct Frame {
  std::vector<uint32_t> s, t, sh, th;
  double lo[3], hi[3];
};

std::string g_error;

}  // namespace

extern "C" {

const char* f4l_last_error() { return g_error.c_str(); }

// Tile two PLY epochs; mirrors the contract of the reference's
// tile_point_clouds (cpp_core/pcd_tiling/pcd_tiling.h:3-12) minus the
// voxel filter (the TPU pipeline subsamples adaptively on-device).
// Returns the tile count, or -1 on error.
int f4l_tile_point_clouds(const char* src_path, const char* tgt_path,
                          int max_pts, int min_pts, double halo,
                          const char* save_dir) {
  Cloud src, tgt;
  if (!read_ply(src_path, &src, &g_error)) return -1;
  if (!read_ply(tgt_path, &tgt, &g_error)) return -1;

  double lo1[3], hi1[3], lo2[3], hi2[3];
  for (int d = 0; d < 3; ++d) {
    lo1[d] = lo2[d] = 1e300; hi1[d] = hi2[d] = -1e300;
  }
  for (size_t i = 0; i < src.n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo1[d] = std::min(lo1[d], src.xyz[3 * i + d]);
      hi1[d] = std::max(hi1[d], src.xyz[3 * i + d]);
    }
  for (size_t i = 0; i < tgt.n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo2[d] = std::min(lo2[d], tgt.xyz[3 * i + d]);
      hi2[d] = std::max(hi2[d], tgt.xyz[3 * i + d]);
    }
  double lo[3], hi[3];
  for (int d = 0; d < 3; ++d) {
    lo[d] = std::max(lo1[d], lo2[d]);
    hi[d] = std::min(hi1[d], hi2[d]);
    if (lo[d] >= hi[d]) { g_error = "epoch bounding boxes do not overlap"; return -1; }
  }

  // Projection axis = argmax overlap face area (pcd_tiling.cpp:844-845).
  double ext[3] = {hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]};
  double areas[3] = {ext[1] * ext[2], ext[0] * ext[2], ext[0] * ext[1]};
  int proj = int(std::max_element(areas, areas + 3) - areas);
  int ax0 = (proj == 0) ? 1 : 0;
  int ax1 = (proj == 2) ? 1 : 2;

  auto inside = [](const double* p, const double* blo, const double* bhi) {
    return p[0] >= blo[0] && p[0] <= bhi[0] && p[1] >= blo[1] &&
           p[1] <= bhi[1] && p[2] >= blo[2] && p[2] <= bhi[2];
  };

  Frame root;
  std::memcpy(root.lo, lo, sizeof lo);
  std::memcpy(root.hi, hi, sizeof hi);
  for (size_t i = 0; i < src.n; ++i)
    if (inside(&src.xyz[3 * i], lo, hi)) root.s.push_back((uint32_t)i);
  for (size_t i = 0; i < tgt.n; ++i)
    if (inside(&tgt.xyz[3 * i], lo, hi)) root.t.push_back((uint32_t)i);
  root.sh = root.s;
  root.th = root.t;

  std::string non_overlap = std::string(save_dir) + "/non_overlap";
  std::string overlap = std::string(save_dir) + "/overlap";
  std::string cmd1 = "mkdir -p '" + non_overlap + "' '" + overlap + "'";
  if (system(cmd1.c_str()) != 0) { g_error = "mkdir failed"; return -1; }

  std::vector<Frame> stack;
  stack.push_back(std::move(root));
  int tile_id = 0;
  while (!stack.empty()) {
    Frame fr = std::move(stack.back());
    stack.pop_back();
    size_t n_max = std::max(fr.s.size(), fr.t.size());
    if (n_max <= (size_t)max_pts) {
      if ((int)std::min(fr.s.size(), fr.t.size()) >
          std::max(1, min_pts - 1)) {
        char name[64];
        snprintf(name, sizeof name, "/source_tile_%d.ply", tile_id);
        write_ply(non_overlap + name, src, fr.s);
        snprintf(name, sizeof name, "/target_tile_%d.ply", tile_id);
        write_ply(non_overlap + name, tgt, fr.t);
        snprintf(name, sizeof name, "/source_tile_%d_overlap.ply", tile_id);
        write_ply(overlap + name, src, fr.sh);
        snprintf(name, sizeof name, "/target_tile_%d_overlap.ply", tile_id);
        write_ply(overlap + name, tgt, fr.th);
        tile_id++;
      }
      continue;
    }
    int ax = (fr.hi[ax0] - fr.lo[ax0] > fr.hi[ax1] - fr.lo[ax1]) ? ax0 : ax1;
    double mid = 0.5 * (fr.lo[ax] + fr.hi[ax]);
    for (int half = 0; half < 2; ++half) {
      Frame child;
      std::memcpy(child.lo, fr.lo, sizeof fr.lo);
      std::memcpy(child.hi, fr.hi, sizeof fr.hi);
      if (half == 0) child.hi[ax] = mid; else child.lo[ax] = mid;
      double olo[3], ohi[3];
      std::memcpy(olo, child.lo, sizeof olo);
      std::memcpy(ohi, child.hi, sizeof ohi);
      olo[ax0] -= halo; ohi[ax0] += halo;
      olo[ax1] -= halo; ohi[ax1] += halo;
      for (uint32_t i : fr.s)
        if (inside(&src.xyz[3 * (size_t)i], child.lo, child.hi))
          child.s.push_back(i);
      for (uint32_t i : fr.t)
        if (inside(&tgt.xyz[3 * (size_t)i], child.lo, child.hi))
          child.t.push_back(i);
      for (uint32_t i : fr.sh)
        if (inside(&src.xyz[3 * (size_t)i], olo, ohi)) child.sh.push_back(i);
      for (uint32_t i : fr.th)
        if (inside(&tgt.xyz[3 * (size_t)i], olo, ohi)) child.th.push_back(i);
      stack.push_back(std::move(child));
    }
  }
  return tile_id;
}

}  // extern "C"
