// sw_renderer — native headless fluid renderer (C++17, zero dependencies).
//
// Replaces the role of the reference's FlexRenderer C++/OpenGL/NvFlex stack
// (reference fluidlab/fluidengine/renderers/gl_renderer_src/FlexRenderer/
// bindings/bindings.cpp:507-527 exports; bindings.cpp:396-505 render loop):
// headless offscreen rendering of fluid particles (sphere/ellipsoid
// impostors with per-pixel normals), triangle meshes, smoke billboards,
// a ground plane with projected soft shadows — plus the neighbor-grid
// smoothing/anisotropy pass that the reference delegates to the NvFlex
// CUDA solver (bindings.cpp:403-418).  Pure CPU rasterization: no GL/EGL
// dependency, bit-deterministic, runs anywhere.
//
// C API (ctypes-friendly), mirroring the reference module surface:
//   swr_init, swr_create_scene, swr_set_camera_params, swr_get_camera_params,
//   swr_set_light, swr_add_mesh, swr_update_mesh, swr_set_particles_state,
//   swr_add_smoke_particles, swr_update_smoke_particles, swr_render,
//   swr_smooth_particles, swr_compute_anisotropy, swr_clean.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  float dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  float norm() const { return std::sqrt(dot(*this)); }
  Vec3 normalized() const {
    float n = norm();
    return n > 1e-12f ? (*this) * (1.0f / n) : Vec3(0, 0, 1);
  }
};

struct Camera {
  Vec3 pos{1.5f, 1.5f, 1.5f};
  Vec3 lookat{0.5f, 0.5f, 0.5f};
  float fov_deg = 30.0f;
  // derived basis
  Vec3 right, up, fwd;
  void update() {
    fwd = (lookat - pos).normalized();
    Vec3 world_up(0, 1, 0);
    right = fwd.cross(world_up).normalized();
    up = right.cross(fwd).normalized();
  }
};

struct Mesh {
  std::vector<float> verts;   // 3N
  std::vector<int32_t> faces; // 3T
  float color[4] = {0.8f, 0.8f, 0.8f, 1.0f};
};

struct Renderer {
  int width = 512, height = 512;
  Camera cam;
  Vec3 light_dir{-0.4f, -0.8f, -0.45f};
  float floor_height = 0.05f;
  bool draw_floor = true;
  float bg_top[3] = {0.26f, 0.32f, 0.42f};
  float bg_bot[3] = {0.09f, 0.10f, 0.13f};

  // particle state
  std::vector<float> px;      // 3N positions
  std::vector<float> pcolor;  // 4N rgba
  std::vector<float> pradius; // N
  std::vector<uint8_t> pused; // N

  // anisotropy (optional; 3 axes scale per particle)
  std::vector<float> aniso; // 3N (radii along principal axes, world approx)

  // smoke
  std::vector<float> sx;     // 3M
  std::vector<float> scolor; // 4M

  std::vector<Mesh> meshes;

  // buffers
  std::vector<float> zbuf;
  std::vector<float> rgb; // 3WH working floats
};

Renderer* g = nullptr;

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// project world point to (screen x, screen y, view depth); returns false
// if behind the camera
inline bool project(const Camera& c, float f_px, int W, int H, const Vec3& p,
                    float& sx, float& sy, float& depth) {
  Vec3 d = p - c.pos;
  float zx = d.dot(c.fwd);
  if (zx < 1e-4f) return false;
  float xx = d.dot(c.right);
  float yy = d.dot(c.up);
  sx = W * 0.5f + xx / zx * f_px;
  sy = H * 0.5f - yy / zx * f_px;
  depth = zx;
  return true;
}

void clear_buffers(Renderer& r) {
  r.zbuf.assign((size_t)r.width * r.height, 1e30f);
  r.rgb.assign((size_t)r.width * r.height * 3, 0.0f);
  for (int y = 0; y < r.height; y++) {
    float t = (float)y / (float)r.height;
    float col[3];
    for (int k = 0; k < 3; k++)
      col[k] = r.bg_top[k] * (1 - t) + r.bg_bot[k] * t;
    for (int x = 0; x < r.width; x++) {
      float* px = &r.rgb[((size_t)y * r.width + x) * 3];
      px[0] = col[0];
      px[1] = col[1];
      px[2] = col[2];
    }
  }
}

// Lambert + Blinn shading for a surface point
inline void shade(const Renderer& r, const Vec3& n, const Vec3& view_dir,
                  const float* base, float shadow, float* out) {
  Vec3 l = (r.light_dir * -1.0f).normalized();
  float diff = std::max(0.0f, n.dot(l));
  Vec3 h = (l + view_dir * -1.0f).normalized();
  float spec = std::pow(std::max(0.0f, n.dot(h)), 32.0f) * 0.35f;
  float amb = 0.35f;
  float li = (amb + 0.75f * diff) * shadow;
  for (int k = 0; k < 3; k++) out[k] = clampf(base[k] * li + spec * shadow, 0, 1);
}

void draw_floor_plane(Renderer& r, float f_px) {
  // ray-cast the floor per pixel (correct depth for occlusion)
  if (!r.draw_floor) return;
  for (int y = 0; y < r.height; y++) {
    for (int x = 0; x < r.width; x++) {
      float ndc_x = (x + 0.5f - r.width * 0.5f) / f_px;
      float ndc_y = (r.height * 0.5f - y - 0.5f) / f_px;
      Vec3 dir = (r.cam.fwd + r.cam.right * ndc_x + r.cam.up * ndc_y).normalized();
      if (std::fabs(dir.y) < 1e-6f) continue;
      float t = (r.floor_height - r.cam.pos.y) / dir.y;
      if (t <= 0) continue;
      Vec3 hit = r.cam.pos + dir * t;
      if (hit.x < -2 || hit.x > 3 || hit.z < -2 || hit.z > 3) continue;
      float depth = t * dir.dot(r.cam.fwd);
      size_t idx = (size_t)y * r.width + x;
      if (depth >= r.zbuf[idx]) continue;
      r.zbuf[idx] = depth;
      // checker
      int cx = (int)std::floor(hit.x * 8.0f);
      int cz = (int)std::floor(hit.z * 8.0f);
      float base = ((cx + cz) & 1) ? 0.42f : 0.35f;
      float col[3] = {base, base, base * 1.04f};
      float out[3];
      shade(r, Vec3(0, 1, 0), dir, col, 1.0f, out);
      float* px = &r.rgb[idx * 3];
      px[0] = out[0];
      px[1] = out[1];
      px[2] = out[2];
    }
  }
}

void splat_particles(Renderer& r, float f_px) {
  size_t n = r.pradius.size();
  bool has_aniso = r.aniso.size() == n * 3;
  for (size_t i = 0; i < n; i++) {
    if (!r.pused.empty() && !r.pused[i]) continue;
    Vec3 p(r.px[3 * i], r.px[3 * i + 1], r.px[3 * i + 2]);
    float sx, sy, depth;
    if (!project(r.cam, f_px, r.width, r.height, p, sx, sy, depth)) continue;
    float rad = r.pradius[i];
    if (has_aniso) {
      // approximate: use mean of the principal radii for the impostor
      rad = (r.aniso[3 * i] + r.aniso[3 * i + 1] + r.aniso[3 * i + 2]) / 3.0f;
    }
    float pr = rad / depth * f_px;
    if (pr < 0.5f) pr = 0.5f;
    int x0 = (int)std::floor(sx - pr), x1 = (int)std::ceil(sx + pr);
    int y0 = (int)std::floor(sy - pr), y1 = (int)std::ceil(sy + pr);
    x0 = std::max(x0, 0); y0 = std::max(y0, 0);
    x1 = std::min(x1, r.width - 1); y1 = std::min(y1, r.height - 1);
    const float* col = &r.pcolor[4 * i];
    for (int y = y0; y <= y1; y++) {
      for (int x = x0; x <= x1; x++) {
        float dx = (x + 0.5f - sx) / pr;
        float dy = (y + 0.5f - sy) / pr;
        float rr = dx * dx + dy * dy;
        if (rr > 1.0f) continue;
        float dz = std::sqrt(1.0f - rr);
        float d = depth - dz * rad; // sphere impostor depth
        size_t idx = (size_t)y * r.width + x;
        if (d >= r.zbuf[idx]) continue;
        r.zbuf[idx] = d;
        // per-pixel normal in camera basis -> world
        Vec3 nrm = (r.cam.right * dx + r.cam.up * (-dy) + r.cam.fwd * (-dz))
                       .normalized();
        Vec3 view = (p - r.cam.pos).normalized();
        float out[3];
        shade(r, nrm, view, col, 1.0f, out);
        float* px = &r.rgb[idx * 3];
        float a = col[3];
        px[0] = out[0] * a + px[0] * (1 - a);
        px[1] = out[1] * a + px[1] * (1 - a);
        px[2] = out[2] * a + px[2] * (1 - a);
      }
    }
  }
}

void raster_triangle(Renderer& r, float f_px, const Vec3& a, const Vec3& b,
                     const Vec3& c, const float* color) {
  float ax, ay, az, bx, by, bz, cx, cy, cz;
  if (!project(r.cam, f_px, r.width, r.height, a, ax, ay, az)) return;
  if (!project(r.cam, f_px, r.width, r.height, b, bx, by, bz)) return;
  if (!project(r.cam, f_px, r.width, r.height, c, cx, cy, cz)) return;
  float area = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay);
  if (std::fabs(area) < 1e-9f) return;
  int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx})));
  int x1 = std::min(r.width - 1, (int)std::ceil(std::max({ax, bx, cx})));
  int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy})));
  int y1 = std::min(r.height - 1, (int)std::ceil(std::max({ay, by, cy})));
  Vec3 nrm = (b - a).cross(c - a).normalized();
  Vec3 view = ((a + b + c) * (1.0f / 3.0f) - r.cam.pos).normalized();
  if (nrm.dot(view) > 0) nrm = nrm * -1.0f; // face the camera
  float out[3];
  shade(r, nrm, view, color, 1.0f, out);
  float inv_area = 1.0f / area;
  for (int y = y0; y <= y1; y++) {
    for (int x = x0; x <= x1; x++) {
      float pxc = x + 0.5f, pyc = y + 0.5f;
      float w0 = ((bx - pxc) * (cy - pyc) - (cx - pxc) * (by - pyc)) * inv_area;
      float w1 = ((cx - pxc) * (ay - pyc) - (ax - pxc) * (cy - pyc)) * inv_area;
      float w2 = 1.0f - w0 - w1;
      if (w0 < 0 || w1 < 0 || w2 < 0) continue;
      float depth = w0 * az + w1 * bz + w2 * cz;
      size_t idx = (size_t)y * r.width + x;
      if (depth >= r.zbuf[idx]) continue;
      r.zbuf[idx] = depth;
      float alpha = color[3];
      float* px = &r.rgb[idx * 3];
      px[0] = out[0] * alpha + px[0] * (1 - alpha);
      px[1] = out[1] * alpha + px[1] * (1 - alpha);
      px[2] = out[2] * alpha + px[2] * (1 - alpha);
    }
  }
}

void draw_meshes(Renderer& r, float f_px) {
  for (const auto& m : r.meshes) {
    size_t nt = m.faces.size() / 3;
    for (size_t t = 0; t < nt; t++) {
      int32_t i0 = m.faces[3 * t], i1 = m.faces[3 * t + 1],
              i2 = m.faces[3 * t + 2];
      Vec3 a(m.verts[3 * i0], m.verts[3 * i0 + 1], m.verts[3 * i0 + 2]);
      Vec3 b(m.verts[3 * i1], m.verts[3 * i1 + 1], m.verts[3 * i1 + 2]);
      Vec3 c(m.verts[3 * i2], m.verts[3 * i2 + 1], m.verts[3 * i2 + 2]);
      raster_triangle(r, f_px, a, b, c, m.color);
    }
  }
}

void draw_smoke(Renderer& r, float f_px) {
  // translucent additive billboards, drawn after opaque geometry
  size_t m = r.sx.size() / 3;
  for (size_t i = 0; i < m; i++) {
    const float* col = &r.scolor[4 * i];
    if (col[3] <= 0.001f) continue;
    Vec3 p(r.sx[3 * i], r.sx[3 * i + 1], r.sx[3 * i + 2]);
    float sxp, syp, depth;
    if (!project(r.cam, f_px, r.width, r.height, p, sxp, syp, depth)) continue;
    float pr = 0.01f / depth * f_px;
    if (pr < 0.5f) pr = 0.5f;
    int x0 = std::max(0, (int)(sxp - pr)), x1 = std::min(r.width - 1, (int)(sxp + pr));
    int y0 = std::max(0, (int)(syp - pr)), y1 = std::min(r.height - 1, (int)(syp + pr));
    for (int y = y0; y <= y1; y++)
      for (int x = x0; x <= x1; x++) {
        size_t idx = (size_t)y * r.width + x;
        if (depth >= r.zbuf[idx]) continue;
        float a = col[3] * 0.25f;
        float* px = &r.rgb[idx * 3];
        px[0] = col[0] * a + px[0] * (1 - a);
        px[1] = col[1] * a + px[1] * (1 - a);
        px[2] = col[2] * a + px[2] * (1 - a);
      }
  }
}

// ---------------- neighbor-grid smoothing / anisotropy --------------------
// The reference obtains smoothed positions + anisotropy ellipsoids from a
// NvFlex solver tick (bindings.cpp:403-418).  Native replacement: uniform
// hash grid; Laplacian position smoothing; per-particle covariance of the
// neighborhood with a 3x3 Jacobi eigensolver.

struct HashGrid {
  float cell;
  int nx, ny, nz;
  std::vector<int> head;
  std::vector<int> next;
  void build(const std::vector<float>& px, const std::vector<uint8_t>& used,
             float cell_size) {
    cell = cell_size;
    nx = ny = nz = std::max(1, (int)std::ceil(1.0f / cell));
    head.assign((size_t)nx * ny * nz, -1);
    size_t n = px.size() / 3;
    next.assign(n, -1);
    for (size_t i = 0; i < n; i++) {
      if (!used.empty() && !used[i]) continue;
      int cx = clampf(px[3 * i] / cell, 0, nx - 1);
      int cy = clampf(px[3 * i + 1] / cell, 0, ny - 1);
      int cz = clampf(px[3 * i + 2] / cell, 0, nz - 1);
      size_t c = ((size_t)cx * ny + cy) * nz + cz;
      next[i] = head[c];
      head[c] = (int)i;
    }
  }
};

void jacobi_eigen3(const float A_in[6], float eig[3]) {
  // symmetric 3x3 (xx, yy, zz, xy, xz, yz) -> eigenvalues
  float a00 = A_in[0], a11 = A_in[1], a22 = A_in[2];
  float a01 = A_in[3], a02 = A_in[4], a12 = A_in[5];
  for (int sweep = 0; sweep < 8; sweep++) {
    // rotate pairs (0,1), (0,2), (1,2)
    auto rot = [](float& app, float& aqq, float& apq, float& apr, float& aqr) {
      if (std::fabs(apq) < 1e-12f) return;
      float tau = (aqq - app) / (2 * apq);
      float t = (tau >= 0 ? 1.0f : -1.0f) /
                (std::fabs(tau) + std::sqrt(1 + tau * tau));
      float c = 1.0f / std::sqrt(1 + t * t), s = t * c;
      float app_n = c * c * app - 2 * s * c * apq + s * s * aqq;
      float aqq_n = s * s * app + 2 * s * c * apq + c * c * aqq;
      float apr_n = c * apr - s * aqr;
      float aqr_n = s * apr + c * aqr;
      app = app_n; aqq = aqq_n; apq = 0; apr = apr_n; aqr = aqr_n;
    };
    rot(a00, a11, a01, a02, a12);
    rot(a00, a22, a02, a01, a12);
    // for pair (1,2) the "other" row entries are a01 (p-r) and a02 (q-r)
    rot(a11, a22, a12, a01, a02);
  }
  eig[0] = a00; eig[1] = a11; eig[2] = a22;
  std::sort(eig, eig + 3, std::greater<float>());
}

} // namespace

extern "C" {

int swr_init(int width, int height) {
  delete g;
  g = new Renderer();
  g->width = width;
  g->height = height;
  g->cam.update();
  return 0;
}

int swr_create_scene(float floor_height, int draw_floor) {
  if (!g) return -1;
  g->floor_height = floor_height;
  g->draw_floor = draw_floor != 0;
  g->meshes.clear();
  return 0;
}

void swr_set_camera_params(const float* pos, const float* lookat, float fov) {
  g->cam.pos = {pos[0], pos[1], pos[2]};
  g->cam.lookat = {lookat[0], lookat[1], lookat[2]};
  g->cam.fov_deg = fov;
  g->cam.update();
}

void swr_get_camera_params(float* pos, float* lookat, float* fov) {
  pos[0] = g->cam.pos.x; pos[1] = g->cam.pos.y; pos[2] = g->cam.pos.z;
  lookat[0] = g->cam.lookat.x; lookat[1] = g->cam.lookat.y;
  lookat[2] = g->cam.lookat.z;
  *fov = g->cam.fov_deg;
}

void swr_set_light(const float* dir) {
  g->light_dir = Vec3(dir[0], dir[1], dir[2]).normalized();
}

int swr_add_mesh(const float* verts, int n_verts, const int32_t* faces,
                 int n_faces, const float* rgba) {
  Mesh m;
  m.verts.assign(verts, verts + (size_t)n_verts * 3);
  m.faces.assign(faces, faces + (size_t)n_faces * 3);
  std::memcpy(m.color, rgba, 4 * sizeof(float));
  g->meshes.push_back(std::move(m));
  return (int)g->meshes.size() - 1;
}

void swr_update_mesh(int mesh_id, const float* verts, int n_verts) {
  if (mesh_id < 0 || mesh_id >= (int)g->meshes.size()) return;
  g->meshes[mesh_id].verts.assign(verts, verts + (size_t)n_verts * 3);
}

void swr_set_particles_state(const float* pos, const float* rgba,
                             const float* radius, const uint8_t* used, int n) {
  g->px.assign(pos, pos + (size_t)n * 3);
  g->pcolor.assign(rgba, rgba + (size_t)n * 4);
  g->pradius.assign(radius, radius + n);
  if (used)
    g->pused.assign(used, used + n);
  else
    g->pused.clear();
  g->aniso.clear();
}

int swr_get_n_particles() { return (int)g->pradius.size(); }

void swr_add_smoke_particles(const float* pos, const float* rgba, int m) {
  g->sx.assign(pos, pos + (size_t)m * 3);
  g->scolor.assign(rgba, rgba + (size_t)m * 4);
}

void swr_update_smoke_particles(const float* rgba, int m) {
  g->scolor.assign(rgba, rgba + (size_t)m * 4);
}

// Laplacian smoothing of particle positions over an r-neighborhood
// (the surface-smoothing role of the reference's NvFlex tick).
void swr_smooth_particles(float radius, float lambda, float* out_pos) {
  size_t n = g->pradius.size();
  HashGrid grid;
  grid.build(g->px, g->pused, radius);
  float r2 = radius * radius;
  for (size_t i = 0; i < n; i++) {
    float cx = g->px[3 * i], cy = g->px[3 * i + 1], cz = g->px[3 * i + 2];
    float mx = 0, my = 0, mz = 0;
    int cnt = 0;
    if (g->pused.empty() || g->pused[i]) {
      int gx = clampf(cx / grid.cell, 0, grid.nx - 1);
      int gy = clampf(cy / grid.cell, 0, grid.ny - 1);
      int gz = clampf(cz / grid.cell, 0, grid.nz - 1);
      for (int dx = -1; dx <= 1; dx++)
        for (int dy = -1; dy <= 1; dy++)
          for (int dz = -1; dz <= 1; dz++) {
            int ax = gx + dx, ay = gy + dy, az = gz + dz;
            if (ax < 0 || ay < 0 || az < 0 || ax >= grid.nx ||
                ay >= grid.ny || az >= grid.nz)
              continue;
            int j = grid.head[((size_t)ax * grid.ny + ay) * grid.nz + az];
            while (j >= 0) {
              float ddx = g->px[3 * j] - cx, ddy = g->px[3 * j + 1] - cy,
                    ddz = g->px[3 * j + 2] - cz;
              if (ddx * ddx + ddy * ddy + ddz * ddz < r2) {
                mx += g->px[3 * j]; my += g->px[3 * j + 1];
                mz += g->px[3 * j + 2];
                cnt++;
              }
              j = grid.next[j];
            }
          }
    }
    if (cnt > 1) {
      mx /= cnt; my /= cnt; mz /= cnt;
      out_pos[3 * i] = cx + lambda * (mx - cx);
      out_pos[3 * i + 1] = cy + lambda * (my - cy);
      out_pos[3 * i + 2] = cz + lambda * (mz - cz);
    } else {
      out_pos[3 * i] = cx; out_pos[3 * i + 1] = cy; out_pos[3 * i + 2] = cz;
    }
  }
}

// Per-particle anisotropy radii from the neighborhood covariance
// (NvFlex anisotropy replacement; out: 3 radii per particle).
void swr_compute_anisotropy(float radius, float scale, float* out_radii) {
  size_t n = g->pradius.size();
  HashGrid grid;
  grid.build(g->px, g->pused, radius);
  float r2 = radius * radius;
  g->aniso.assign(n * 3, 0.0f);
  for (size_t i = 0; i < n; i++) {
    float cx = g->px[3 * i], cy = g->px[3 * i + 1], cz = g->px[3 * i + 2];
    float C[6] = {0, 0, 0, 0, 0, 0};
    int cnt = 0;
    if (g->pused.empty() || g->pused[i]) {
      int gx = clampf(cx / grid.cell, 0, grid.nx - 1);
      int gy = clampf(cy / grid.cell, 0, grid.ny - 1);
      int gz = clampf(cz / grid.cell, 0, grid.nz - 1);
      for (int dx = -1; dx <= 1; dx++)
        for (int dy = -1; dy <= 1; dy++)
          for (int dz = -1; dz <= 1; dz++) {
            int ax = gx + dx, ay = gy + dy, az = gz + dz;
            if (ax < 0 || ay < 0 || az < 0 || ax >= grid.nx ||
                ay >= grid.ny || az >= grid.nz)
              continue;
            int j = grid.head[((size_t)ax * grid.ny + ay) * grid.nz + az];
            while (j >= 0) {
              float ddx = g->px[3 * j] - cx, ddy = g->px[3 * j + 1] - cy,
                    ddz = g->px[3 * j + 2] - cz;
              float dd = ddx * ddx + ddy * ddy + ddz * ddz;
              if (dd < r2) {
                C[0] += ddx * ddx; C[1] += ddy * ddy; C[2] += ddz * ddz;
                C[3] += ddx * ddy; C[4] += ddx * ddz; C[5] += ddy * ddz;
                cnt++;
              }
              j = grid.next[j];
            }
          }
    }
    float base = g->pradius[i];
    if (cnt >= 4) {
      for (int k = 0; k < 6; k++) C[k] /= cnt;
      float eig[3];
      jacobi_eigen3(C, eig);
      float s0 = std::sqrt(std::max(eig[0], 1e-12f));
      for (int k = 0; k < 3; k++) {
        float sk = std::sqrt(std::max(eig[k], 1e-12f));
        // clamp aspect like typical surface reconstruction
        sk = std::max(sk, 0.25f * s0);
        out_radii[3 * i + k] = clampf(sk * scale, 0.5f * base, 4.0f * base);
      }
    } else {
      out_radii[3 * i] = out_radii[3 * i + 1] = out_radii[3 * i + 2] = base;
    }
    g->aniso[3 * i] = out_radii[3 * i];
    g->aniso[3 * i + 1] = out_radii[3 * i + 1];
    g->aniso[3 * i + 2] = out_radii[3 * i + 2];
  }
}

// Render to an RGBA uint8 buffer of size width*height*4.
void swr_render(uint8_t* out_rgba) {
  Renderer& r = *g;
  float f_px = 0.5f * r.height / std::tan(r.cam.fov_deg * (float)M_PI / 360.0f);
  clear_buffers(r);
  draw_floor_plane(r, f_px);
  draw_meshes(r, f_px);
  splat_particles(r, f_px);
  draw_smoke(r, f_px);
  size_t total = (size_t)r.width * r.height;
  for (size_t i = 0; i < total; i++) {
    out_rgba[4 * i] = (uint8_t)(clampf(r.rgb[3 * i], 0, 1) * 255.0f);
    out_rgba[4 * i + 1] = (uint8_t)(clampf(r.rgb[3 * i + 1], 0, 1) * 255.0f);
    out_rgba[4 * i + 2] = (uint8_t)(clampf(r.rgb[3 * i + 2], 0, 1) * 255.0f);
    out_rgba[4 * i + 3] = 255;
  }
}

void swr_clean() {
  delete g;
  g = nullptr;
}

} // extern "C"
