// sw_renderer — native headless fluid renderer (C++17, zero dependencies).
//
// Replaces the role of the reference's FlexRenderer C++/OpenGL/NvFlex stack
// (reference fluidlab/fluidengine/renderers/gl_renderer_src/FlexRenderer/
// bindings/bindings.cpp:507-527 exports; bindings.cpp:396-505 render loop;
// bindings/opengl/shadersGL.cpp ellipsoid depth/thickness/composite
// shaders): headless offscreen rendering with the same screen-space fluid
// pipeline, implemented as a pure CPU rasterizer — no GL/EGL dependency,
// bit-deterministic, runs anywhere.
//
// Pipeline (mirrors the reference pass structure):
//   1. shadow map        — light-space ortho depth of particles + meshes
//                          (RenderShadowMap role, PCF-sampled)
//   2. opaque pass       — floor + meshes with shadows
//   3. ellipsoid splat   — per-pixel ray/ellipsoid intersection writes the
//                          fluid depth, thickness and surface color buffers
//                          (EllipsoidDepthShader / thickness pass)
//   4. bilateral blur    — separable depth-range-weighted smoothing of the
//                          fluid depth (BilateralBlur shader)
//   5. composite         — normals reconstructed from smoothed depth;
//                          Beer-Lambert absorption of the refracted
//                          background, Fresnel sky reflection, Blinn
//                          specular, shadowing (CompositeShader)
//   6. volumetric smoke  — density grid voxelized from the smoke points,
//                          front-to-back ray march against the z-buffer
//                          (the reference's volume smoke rendering role)
//
// C API (ctypes-friendly), mirroring the reference module surface:
//   swr_init, swr_create_scene, swr_set_camera_params, swr_get_camera_params,
//   swr_set_light, swr_add_mesh, swr_update_mesh, swr_set_particles_state,
//   swr_add_smoke_particles, swr_update_smoke_particles, swr_render,
//   swr_smooth_particles, swr_compute_anisotropy, swr_set_fluid_params,
//   swr_clean.

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

// light-space orthographic shadow map over the scene box
struct ShadowMap {
  int res = 384;
  Vec3 lx, ly, lz;     // basis; lz points TOWARD the light
  float x0, x1, y0, y1, d0, d1;  // light-space extents
  std::vector<float> depth;      // min distance-from-light per texel

  void setup(const Vec3& light_dir) {
    lz = (light_dir * -1.0f).normalized();  // toward the light
    Vec3 ref = std::fabs(lz.y) < 0.95f ? Vec3(0, 1, 0) : Vec3(1, 0, 0);
    lx = lz.cross(ref).normalized();
    ly = lz.cross(lx);
    x0 = y0 = d0 = 1e30f;
    x1 = y1 = d1 = -1e30f;
    for (int c = 0; c < 8; c++) {
      Vec3 p((c & 1) ? 1.3f : -0.3f, (c & 2) ? 1.3f : -0.3f,
             (c & 4) ? 1.3f : -0.3f);
      float sx = p.dot(lx), sy = p.dot(ly), sd = -p.dot(lz);
      x0 = std::min(x0, sx); x1 = std::max(x1, sx);
      y0 = std::min(y0, sy); y1 = std::max(y1, sy);
      d0 = std::min(d0, sd); d1 = std::max(d1, sd);
    }
    depth.assign((size_t)res * res, 1e30f);
  }
  // world -> (texel x, texel y, light depth)
  inline void to_light(const Vec3& p, float& tx, float& ty, float& td) const {
    tx = (p.dot(lx) - x0) / (x1 - x0) * (res - 1);
    ty = (p.dot(ly) - y0) / (y1 - y0) * (res - 1);
    td = -p.dot(lz);
  }
  void splat_disk(const Vec3& p, float rad) {
    float tx, ty, td;
    to_light(p, tx, ty, td);
    float pr = rad / (x1 - x0) * (res - 1);
    int a0 = std::max(0, (int)(tx - pr)), a1 = std::min(res - 1, (int)(tx + pr));
    int b0 = std::max(0, (int)(ty - pr)), b1 = std::min(res - 1, (int)(ty + pr));
    for (int b = b0; b <= b1; b++)
      for (int a = a0; a <= a1; a++) {
        size_t i = (size_t)b * res + a;
        if (td < depth[i]) depth[i] = td;
      }
  }
  void splat_tri(const Vec3& A, const Vec3& B, const Vec3& C) {
    float ax, ay, ad, bx, by, bd, cx, cy, cd;
    to_light(A, ax, ay, ad);
    to_light(B, bx, by, bd);
    to_light(C, cx, cy, cd);
    float area = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay);
    if (std::fabs(area) < 1e-9f) return;
    int a0 = std::max(0, (int)std::floor(std::min({ax, bx, cx})));
    int a1 = std::min(res - 1, (int)std::ceil(std::max({ax, bx, cx})));
    int b0 = std::max(0, (int)std::floor(std::min({ay, by, cy})));
    int b1 = std::min(res - 1, (int)std::ceil(std::max({ay, by, cy})));
    float inv_area = 1.0f / area;
    for (int b = b0; b <= b1; b++)
      for (int a = a0; a <= a1; a++) {
        float px = a + 0.5f, py = b + 0.5f;
        float w0 = ((bx - px) * (cy - py) - (cx - px) * (by - py)) * inv_area;
        float w1 = ((cx - px) * (ay - py) - (ax - px) * (cy - py)) * inv_area;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        float d = w0 * ad + w1 * bd + w2 * cd;
        size_t i = (size_t)b * res + a;
        if (d < depth[i]) depth[i] = d;
      }
  }
  // PCF 3x3: fraction lit at world point p (bias in light-depth units)
  float lit(const Vec3& p, float bias) const {
    float tx, ty, td;
    to_light(p, tx, ty, td);
    int cx = (int)tx, cy = (int)ty;
    float s = 0;
    int n = 0;
    for (int dy = -1; dy <= 1; dy++)
      for (int dx = -1; dx <= 1; dx++) {
        int a = cx + dx, b = cy + dy;
        if (a < 0 || b < 0 || a >= res || b >= res) { s += 1; n++; continue; }
        s += (td <= depth[(size_t)b * res + a] + bias) ? 1.0f : 0.0f;
        n++;
      }
    return s / n;
  }
};

struct FluidParams {
  float absorption = 35.0f;   // Beer-Lambert extinction per world unit
  float refraction = 28.0f;   // screen-space refraction offset scale (px/unit)
  float blur_radius = 5.0f;   // bilateral blur half-width (px)
  int blur_iters = 2;
  float smoke_sigma = 55.0f;  // volumetric smoke extinction
  int smoke_grid = 40;        // voxelization resolution
};

struct Renderer {
  int width = 512, height = 512;
  Camera cam;
  Vec3 light_dir{-0.4f, -0.8f, -0.45f};
  float floor_height = 0.05f;
  bool draw_floor = true;
  float bg_top[3] = {0.26f, 0.32f, 0.42f};
  float bg_bot[3] = {0.09f, 0.10f, 0.13f};
  FluidParams fp;

  // particle state
  std::vector<float> px;      // 3N positions
  std::vector<float> pcolor;  // 4N rgba
  std::vector<float> pradius; // N
  std::vector<uint8_t> pused; // N

  // anisotropy: per-particle principal half-axes (world), 9N col-major
  // [a1 | a2 | a3]; empty -> spheres of pradius
  std::vector<float> aniso_axes;

  // per-particle velocities (3N, optional) — feed the diffuse/spray pass
  std::vector<float> pvel;

  // diffuse (spray/foam) sprites generated by swr_compute_diffuse
  // (reference FlexRenderer reads them from NvFlex,
  // bindings.cpp:421-428, and composites velocity-stretched point
  // sprites over the fluid surface, shadersGL.cpp RenderDiffuse
  // :2817-2860; here they are derived natively from the particle
  // neighborhood/speed and drawn by draw_diffuse)
  std::vector<float> dpos;  // 3D
  std::vector<float> dvel;  // 3D
  std::vector<float> dlife; // D in (0, 1]: brightness/size fade
  float diffuse_color[4] = {0.92f, 0.96f, 1.0f, 0.5f};
  float diffuse_radius = 0.004f;
  float diffuse_motion = 0.012f; // velocity stretch (seconds of blur)

  // smoke
  std::vector<float> sx;     // 3M
  std::vector<float> scolor; // 4M

  std::vector<Mesh> meshes;
  ShadowMap sm;

  // buffers
  std::vector<float> zbuf;
  std::vector<float> rgb;    // 3WH working floats
  std::vector<float> fz;     // fluid surface depth
  std::vector<float> fthick; // fluid thickness (world units)
  std::vector<float> fcol;   // 4WH nearest-surface fluid color (rgb + alpha)
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

// pixel -> world ray direction (unit) and its view-forward component
inline Vec3 pixel_ray(const Renderer& r, float f_px, float x, float y,
                      float& cosf_out) {
  float ndc_x = (x + 0.5f - r.width * 0.5f) / f_px;
  float ndc_y = (r.height * 0.5f - y - 0.5f) / f_px;
  Vec3 dir = (r.cam.fwd + r.cam.right * ndc_x + r.cam.up * ndc_y).normalized();
  cosf_out = dir.dot(r.cam.fwd);
  return dir;
}

void bg_color(const Renderer& r, int y, float* col) {
  float t = (float)y / (float)r.height;
  for (int k = 0; k < 3; k++)
    col[k] = r.bg_top[k] * (1 - t) + r.bg_bot[k] * t;
}

void clear_buffers(Renderer& r) {
  size_t total = (size_t)r.width * r.height;
  r.zbuf.assign(total, 1e30f);
  r.rgb.assign(total * 3, 0.0f);
  r.fz.assign(total, 1e30f);
  r.fthick.assign(total, 0.0f);
  r.fcol.assign(total * 4, 0.0f);
  for (int y = 0; y < r.height; y++) {
    float col[3];
    bg_color(r, y, col);
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
  float li = (amb + 0.75f * diff * shadow);
  for (int k = 0; k < 3; k++)
    out[k] = clampf(base[k] * li + spec * shadow, 0, 1);
}

void build_shadow_map(Renderer& r) {
  r.sm.setup(r.light_dir);
  size_t n = r.pradius.size();
  bool has_axes = r.aniso_axes.size() == n * 9;
  for (size_t i = 0; i < n; i++) {
    if (!r.pused.empty() && !r.pused[i]) continue;
    Vec3 p(r.px[3 * i], r.px[3 * i + 1], r.px[3 * i + 2]);
    float rad = r.pradius[i];
    if (has_axes) {
      const float* A = &r.aniso_axes[9 * i];
      for (int k = 0; k < 3; k++) {
        float an = std::sqrt(A[3 * k] * A[3 * k] + A[3 * k + 1] * A[3 * k + 1]
                             + A[3 * k + 2] * A[3 * k + 2]);
        rad = std::max(rad, an);
      }
    }
    r.sm.splat_disk(p, rad);
  }
  for (const auto& m : r.meshes) {
    size_t nt = m.faces.size() / 3;
    for (size_t t = 0; t < nt; t++) {
      int32_t i0 = m.faces[3 * t], i1 = m.faces[3 * t + 1],
              i2 = m.faces[3 * t + 2];
      r.sm.splat_tri(
          Vec3(m.verts[3 * i0], m.verts[3 * i0 + 1], m.verts[3 * i0 + 2]),
          Vec3(m.verts[3 * i1], m.verts[3 * i1 + 1], m.verts[3 * i1 + 2]),
          Vec3(m.verts[3 * i2], m.verts[3 * i2 + 1], m.verts[3 * i2 + 2]));
    }
  }
}

void draw_floor_plane(Renderer& r, float f_px) {
  // ray-cast the floor per pixel (correct depth for occlusion)
  if (!r.draw_floor) return;
  float bias = (r.sm.d1 - r.sm.d0) * 8e-3f;
  for (int y = 0; y < r.height; y++) {
    for (int x = 0; x < r.width; x++) {
      float cosf;
      Vec3 dir = pixel_ray(r, f_px, x, y, cosf);
      if (std::fabs(dir.y) < 1e-6f) continue;
      float t = (r.floor_height - r.cam.pos.y) / dir.y;
      if (t <= 0) continue;
      Vec3 hit = r.cam.pos + dir * t;
      if (hit.x < -2 || hit.x > 3 || hit.z < -2 || hit.z > 3) continue;
      float depth = t * cosf;
      size_t idx = (size_t)y * r.width + x;
      if (depth >= r.zbuf[idx]) continue;
      r.zbuf[idx] = depth;
      // checker
      int cx = (int)std::floor(hit.x * 8.0f);
      int cz = (int)std::floor(hit.z * 8.0f);
      float base = ((cx + cz) & 1) ? 0.42f : 0.35f;
      float col[3] = {base, base, base * 1.04f};
      float lit = 0.35f + 0.65f * r.sm.lit(hit, bias);
      float out[3];
      shade(r, Vec3(0, 1, 0), dir, col, lit, out);
      float* px = &r.rgb[idx * 3];
      px[0] = out[0];
      px[1] = out[1];
      px[2] = out[2];
    }
  }
}

// invert a 3x3 (columns c0,c1,c2); returns false if near-singular
inline bool invert3(const float* c0, const float* c1, const float* c2,
                    float inv[9]) {
  float a = c0[0], d = c0[1], gg = c0[2];
  float b = c1[0], e = c1[1], h = c1[2];
  float c = c2[0], f = c2[1], i = c2[2];
  float A = e * i - f * h, B = f * gg - d * i, C = d * h - e * gg;
  float det = a * A + b * B + c * C;
  if (std::fabs(det) < 1e-18f) return false;
  float s = 1.0f / det;
  inv[0] = A * s; inv[3] = (c * h - b * i) * s; inv[6] = (b * f - c * e) * s;
  inv[1] = B * s; inv[4] = (a * i - c * gg) * s; inv[7] = (c * d - a * f) * s;
  inv[2] = C * s; inv[5] = (b * gg - a * h) * s; inv[8] = (a * e - b * d) * s;
  return true;
}

inline Vec3 mat3_mul(const float* M, const Vec3& v) {
  // column-major 3x3
  return Vec3(M[0] * v.x + M[3] * v.y + M[6] * v.z,
              M[1] * v.x + M[4] * v.y + M[7] * v.z,
              M[2] * v.x + M[5] * v.y + M[8] * v.z);
}

// Screen-space ellipsoid splat: exact per-pixel ray/ellipsoid intersection
// writes fluid depth (near hit), thickness (chord length) and the
// nearest-surface color (reference EllipsoidDepthShader + thickness pass,
// shadersGL.cpp).
void splat_fluid(Renderer& r, float f_px) {
  size_t n = r.pradius.size();
  bool has_axes = r.aniso_axes.size() == n * 9;
  for (size_t i = 0; i < n; i++) {
    if (!r.pused.empty() && !r.pused[i]) continue;
    Vec3 p(r.px[3 * i], r.px[3 * i + 1], r.px[3 * i + 2]);
    float sx, sy, depth;
    if (!project(r.cam, f_px, r.width, r.height, p, sx, sy, depth)) continue;
    float inv9[9];
    float rmax;
    if (has_axes) {
      const float* A = &r.aniso_axes[9 * i];
      if (!invert3(A, A + 3, A + 6, inv9)) continue;
      rmax = 0;
      for (int k = 0; k < 3; k++)
        rmax = std::max(rmax, std::sqrt(
            A[3 * k] * A[3 * k] + A[3 * k + 1] * A[3 * k + 1]
            + A[3 * k + 2] * A[3 * k + 2]));
    } else {
      float rad = std::max(r.pradius[i], 1e-6f);
      std::memset(inv9, 0, sizeof(inv9));
      inv9[0] = inv9[4] = inv9[8] = 1.0f / rad;
      rmax = rad;
    }
    float pr = rmax / depth * f_px;
    if (pr < 0.5f) pr = 0.5f;
    int x0 = std::max(0, (int)std::floor(sx - pr));
    int x1 = std::min(r.width - 1, (int)std::ceil(sx + pr));
    int y0 = std::max(0, (int)std::floor(sy - pr));
    int y1 = std::min(r.height - 1, (int)std::ceil(sy + pr));
    const float* col = &r.pcolor[4 * i];
    Vec3 oc = r.cam.pos - p;
    Vec3 u = mat3_mul(inv9, oc);
    float uu = u.dot(u);
    for (int y = y0; y <= y1; y++) {
      for (int x = x0; x <= x1; x++) {
        float cosf;
        Vec3 dir = pixel_ray(r, f_px, x, y, cosf);
        Vec3 w = mat3_mul(inv9, dir);
        float a = w.dot(w);
        float b = u.dot(w);
        float c = uu - 1.0f;
        float disc = b * b - a * c;
        if (disc <= 0 || a < 1e-18f) continue;
        float sq = std::sqrt(disc);
        float t0 = (-b - sq) / a;
        float t1 = (-b + sq) / a;
        if (t1 <= 1e-4f) continue;
        t0 = std::max(t0, 1e-4f);
        size_t idx = (size_t)y * r.width + x;
        float znear = t0 * cosf;
        if (znear >= r.zbuf[idx]) continue;  // behind opaque geometry
        r.fthick[idx] += (t1 - t0) * cosf;
        if (znear < r.fz[idx]) {
          r.fz[idx] = znear;
          float* fc = &r.fcol[idx * 4];
          fc[0] = col[0]; fc[1] = col[1]; fc[2] = col[2]; fc[3] = col[3];
        }
      }
    }
  }
}

// Separable bilateral blur of the fluid depth (reference BilateralBlur
// shader: gaussian in screen space, range-weighted in depth so
// silhouettes stay sharp) + plain gaussian on thickness.
void blur_fluid(Renderer& r, float mean_rad) {
  int R = (int)r.fp.blur_radius;
  if (R <= 0) return;
  float sig_s = R * 0.5f;
  float sig_r = std::max(mean_rad * 5.0f, 1e-4f);
  float inv2ss = 1.0f / (2 * sig_s * sig_s);
  float inv2sr = 1.0f / (2 * sig_r * sig_r);
  size_t total = (size_t)r.width * r.height;
  std::vector<float> tmp(total);
  std::vector<float> tmp_t(total);
  auto pass = [&](bool horiz, const std::vector<float>& src,
                  std::vector<float>& dst, const std::vector<float>& tsrc,
                  std::vector<float>& tdst) {
    for (int y = 0; y < r.height; y++)
      for (int x = 0; x < r.width; x++) {
        size_t idx = (size_t)y * r.width + x;
        float z0 = src[idx];
        if (z0 > 1e29f) { dst[idx] = z0; tdst[idx] = tsrc[idx]; continue; }
        float sw = 0, sz = 0, tw = 0, tv = 0;
        for (int o = -R; o <= R; o++) {
          int xx = horiz ? x + o : x;
          int yy = horiz ? y : y + o;
          if (xx < 0 || yy < 0 || xx >= r.width || yy >= r.height) continue;
          size_t j = (size_t)yy * r.width + xx;
          float ws = std::exp(-(float)(o * o) * inv2ss);
          float zj = src[j];
          if (zj < 1e29f) {
            float dz = zj - z0;
            float wr = std::exp(-dz * dz * inv2sr);
            sw += ws * wr;
            sz += ws * wr * zj;
          }
          tw += ws;
          tv += ws * tsrc[j];
        }
        dst[idx] = sw > 0 ? sz / sw : z0;
        tdst[idx] = tw > 0 ? tv / tw : tsrc[idx];
      }
  };
  for (int it = 0; it < r.fp.blur_iters; it++) {
    pass(true, r.fz, tmp, r.fthick, tmp_t);
    pass(false, tmp, r.fz, tmp_t, r.fthick);
  }
}

// view-space position of pixel (x, y) at fluid depth z (camera basis)
inline Vec3 view_pos(const Renderer& r, float f_px, int x, int y, float z) {
  float ndc_x = (x + 0.5f - r.width * 0.5f) / f_px;
  float ndc_y = (r.height * 0.5f - y - 0.5f) / f_px;
  return Vec3(ndc_x * z, ndc_y * z, z);
}

// Composite the fluid over the opaque image: normals from the smoothed
// depth, Beer-Lambert absorption of the refracted background, Fresnel sky
// reflection, Blinn specular, shadow-map lighting (reference
// CompositeShader, shadersGL.cpp).
void composite_fluid(Renderer& r, float f_px) {
  std::vector<float> out_rgb(r.rgb);  // read background, write over
  float bias = (r.sm.d1 - r.sm.d0) * 8e-3f;
  Vec3 l = (r.light_dir * -1.0f).normalized();
  for (int y = 0; y < r.height; y++) {
    for (int x = 0; x < r.width; x++) {
      size_t idx = (size_t)y * r.width + x;
      float z = r.fz[idx];
      if (z > 1e29f || z >= r.zbuf[idx]) continue;
      // --- normal from smoothed depth (smaller one-sided difference
      // wins, so silhouette pixels do not smear normals)
      auto zat = [&](int xx, int yy) {
        xx = std::max(0, std::min(r.width - 1, xx));
        yy = std::max(0, std::min(r.height - 1, yy));
        float v = r.fz[(size_t)yy * r.width + xx];
        return v > 1e29f ? z : v;
      };
      Vec3 P = view_pos(r, f_px, x, y, z);
      Vec3 Pxp = view_pos(r, f_px, x + 1, y, zat(x + 1, y));
      Vec3 Pxm = view_pos(r, f_px, x - 1, y, zat(x - 1, y));
      Vec3 Pyp = view_pos(r, f_px, x, y + 1, zat(x, y + 1));
      Vec3 Pym = view_pos(r, f_px, x, y - 1, zat(x, y - 1));
      Vec3 ddx = (std::fabs(Pxp.z - P.z) < std::fabs(P.z - Pxm.z))
                     ? Pxp - P : P - Pxm;
      Vec3 ddy = (std::fabs(Pyp.z - P.z) < std::fabs(P.z - Pym.z))
                     ? Pyp - P : P - Pym;
      Vec3 nc = ddx.cross(ddy).normalized();  // camera-space
      if (nc.z > 0) nc = nc * -1.0f;          // face the camera
      Vec3 n = (r.cam.right * nc.x + r.cam.up * nc.y + r.cam.fwd * nc.z)
                   .normalized();
      float cosf;
      Vec3 view = pixel_ray(r, f_px, x, y, cosf);
      Vec3 wp = r.cam.pos + view * (z / cosf);

      float thick = r.fthick[idx];
      const float* fc = &r.fcol[idx * 4];
      float calpha = fc[3];

      // --- refracted background: offset sample along the screen-space
      // normal, scaled by thickness (shadersGL.cpp composite trick)
      float off = r.fp.refraction * thick;
      int rx = x + (int)(nc.x * off);
      int ry = y - (int)(nc.y * off);
      rx = std::max(0, std::min(r.width - 1, rx));
      ry = std::max(0, std::min(r.height - 1, ry));
      size_t ridx = (size_t)ry * r.width + rx;
      // only refract onto pixels behind the fluid surface
      const float* bgp = (r.zbuf[ridx] > z) ? &r.rgb[ridx * 3]
                                            : &r.rgb[idx * 3];
      // --- Beer-Lambert absorption toward the fluid color
      float k = r.fp.absorption;
      float trans[3];
      for (int c = 0; c < 3; c++) {
        float absorb = std::exp(-(1.05f - fc[c]) * k * thick);
        trans[c] = bgp[c] * absorb;
      }
      // body color contribution: dense fluid shows its own shaded color
      float body_a = 1.0f - std::exp(-2.5f * k * thick * 0.08f);
      body_a = clampf(body_a * calpha, 0.0f, 1.0f);
      float lit = 0.35f + 0.65f * r.sm.lit(wp, bias);
      float diff = 0.35f + 0.65f * std::max(0.0f, n.dot(l));
      float body[3];
      for (int c = 0; c < 3; c++) body[c] = fc[c] * diff * lit;

      // --- Fresnel sky reflection + Blinn specular
      float ndv = std::max(0.0f, -nc.z * 1.0f);
      // use world view dir for reflection
      float fres = 0.02f + 0.98f * std::pow(1.0f - ndv, 5.0f);
      Vec3 refl = view - n * (2.0f * view.dot(n));
      float sky_t = clampf(0.5f - 0.5f * refl.y, 0.0f, 1.0f);
      float sky[3];
      for (int c = 0; c < 3; c++)
        sky[c] = r.bg_top[c] * (1 - sky_t) + r.bg_bot[c] * sky_t + 0.25f;
      Vec3 hv = (l - view).normalized();
      float spec = std::pow(std::max(0.0f, n.dot(hv)), 120.0f) * lit;

      float* op = &out_rgb[idx * 3];
      for (int c = 0; c < 3; c++) {
        float base = trans[c] * (1 - body_a) + body[c] * body_a;
        op[c] = clampf(base * (1 - fres) + sky[c] * fres * 0.6f + spec, 0, 1);
      }
      r.zbuf[idx] = z;  // fluid occludes smoke behind it
    }
  }
  r.rgb.swap(out_rgb);
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
  Vec3 centroid = (a + b + c) * (1.0f / 3.0f);
  Vec3 view = (centroid - r.cam.pos).normalized();
  if (nrm.dot(view) > 0) nrm = nrm * -1.0f; // face the camera
  float bias = (r.sm.d1 - r.sm.d0) * 1.5e-2f;
  float lit = 0.35f + 0.65f * r.sm.lit(centroid + nrm * 0.01f, bias);
  float out[3];
  shade(r, nrm, view, color, lit, out);
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

// Volumetric smoke: voxelize the smoke points into a density+color grid
// over the unit domain and front-to-back ray-march every pixel against
// the z-buffer (the reference's volume smoke rendering role; replaces
// the old additive billboards).
void draw_smoke_volumetric(Renderer& r, float f_px) {
  size_t m = r.sx.size() / 3;
  if (m == 0) return;
  int Gr = r.fp.smoke_grid;
  size_t g3 = (size_t)Gr * Gr * Gr;
  std::vector<float> dens(g3, 0.0f);
  std::vector<float> colr(g3 * 3, 0.0f);
  float maxd = 0;
  for (size_t i = 0; i < m; i++) {
    const float* col = &r.scolor[4 * i];
    if (col[3] <= 1e-3f) continue;
    int cx = (int)clampf(r.sx[3 * i] * Gr, 0, Gr - 1);
    int cy = (int)clampf(r.sx[3 * i + 1] * Gr, 0, Gr - 1);
    int cz = (int)clampf(r.sx[3 * i + 2] * Gr, 0, Gr - 1);
    size_t v = ((size_t)cx * Gr + cy) * Gr + cz;
    dens[v] += col[3];
    for (int k = 0; k < 3; k++) colr[v * 3 + k] += col[k] * col[3];
    maxd = std::max(maxd, dens[v]);
  }
  if (maxd <= 0) return;
  for (size_t v = 0; v < g3; v++)
    if (dens[v] > 0)
      for (int k = 0; k < 3; k++) colr[v * 3 + k] /= dens[v];

  auto sample = [&](const Vec3& p, float* c_out) -> float {
    // trilinear density, nearest color
    float fx = clampf(p.x * Gr - 0.5f, 0, Gr - 1.001f);
    float fy = clampf(p.y * Gr - 0.5f, 0, Gr - 1.001f);
    float fz = clampf(p.z * Gr - 0.5f, 0, Gr - 1.001f);
    int ix = (int)fx, iy = (int)fy, iz = (int)fz;
    float tx = fx - ix, ty = fy - iy, tz = fz - iz;
    float d = 0;
    for (int a = 0; a < 2; a++)
      for (int b = 0; b < 2; b++)
        for (int c = 0; c < 2; c++) {
          int xx = std::min(ix + a, Gr - 1);
          int yy = std::min(iy + b, Gr - 1);
          int zz = std::min(iz + c, Gr - 1);
          float w = (a ? tx : 1 - tx) * (b ? ty : 1 - ty) * (c ? tz : 1 - tz);
          d += w * dens[((size_t)xx * Gr + yy) * Gr + zz];
        }
    size_t vn = ((size_t)(int)(fx + 0.5f) * Gr + (int)(fy + 0.5f)) * Gr
                + (int)(fz + 0.5f);
    c_out[0] = colr[vn * 3]; c_out[1] = colr[vn * 3 + 1];
    c_out[2] = colr[vn * 3 + 2];
    return d;
  };

  float step = 1.0f / (float)Gr;
  float sigma = r.fp.smoke_sigma / maxd;  // normalize to peak density
  for (int y = 0; y < r.height; y++) {
    for (int x = 0; x < r.width; x++) {
      float cosf;
      Vec3 dir = pixel_ray(r, f_px, x, y, cosf);
      // intersect the unit cube [0,1]^3
      float t0 = 0, t1 = 1e30f;
      const float o[3] = {r.cam.pos.x, r.cam.pos.y, r.cam.pos.z};
      const float dd[3] = {dir.x, dir.y, dir.z};
      bool miss = false;
      for (int a = 0; a < 3; a++) {
        if (std::fabs(dd[a]) < 1e-9f) {
          if (o[a] < 0 || o[a] > 1) { miss = true; break; }
          continue;
        }
        float ta = (0 - o[a]) / dd[a], tb = (1 - o[a]) / dd[a];
        if (ta > tb) std::swap(ta, tb);
        t0 = std::max(t0, ta);
        t1 = std::min(t1, tb);
      }
      if (miss || t1 <= t0) continue;
      size_t idx = (size_t)y * r.width + x;
      t1 = std::min(t1, r.zbuf[idx] / cosf);
      if (t1 <= t0) continue;
      float T = 1.0f;
      float acc[3] = {0, 0, 0};
      for (float t = t0 + 0.5f * step; t < t1; t += step) {
        Vec3 p = r.cam.pos + dir * t;
        float cs[3];
        float d = sample(p, cs);
        if (d <= 1e-5f) continue;
        float a = 1.0f - std::exp(-sigma * d * step);
        for (int k = 0; k < 3; k++) acc[k] += T * a * cs[k];
        T *= 1.0f - a;
        if (T < 0.02f) break;
      }
      if (T > 0.999f) continue;
      float* px = &r.rgb[idx * 3];
      for (int k = 0; k < 3; k++)
        px[k] = clampf(acc[k] + px[k] * T, 0, 1);
    }
  }
}

// ---------------- diffuse (spray/foam) sprites ----------------------------
// Mirrors the role of the reference's diffuse pass (shadersGL.cpp
// RenderDiffuse :2817-2860): velocity-stretched soft point sprites,
// premultiplied-alpha blended over the composited fluid, depth-tested
// against the scene but not depth-writing.  Sprites are sampled along
// the screen-space motion segment (the GL geometry shader's quad
// stretch, shadersGL.cpp :2694-2741) as gaussian splats.

void draw_diffuse(Renderer& r, float f_px) {
  size_t d = r.dpos.size() / 3;
  if (d == 0) return;
  const float* col = r.diffuse_color;
  for (size_t i = 0; i < d; i++) {
    Vec3 p(r.dpos[3 * i], r.dpos[3 * i + 1], r.dpos[3 * i + 2]);
    Vec3 v(r.dvel[3 * i], r.dvel[3 * i + 1], r.dvel[3 * i + 2]);
    float life = r.dlife.empty() ? 1.0f : r.dlife[i];
    Vec3 p1 = p - v * r.diffuse_motion;  // motion tail
    float sx0, sy0, z0, sx1, sy1, z1;
    if (!project(r.cam, f_px, r.width, r.height, p, sx0, sy0, z0)) continue;
    if (!project(r.cam, f_px, r.width, r.height, p1, sx1, sy1, z1)) {
      sx1 = sx0; sy1 = sy0; z1 = z0;
    }
    float rad_px = std::max(0.75f, r.diffuse_radius * life * f_px / z0);
    float seg = std::hypot(sx1 - sx0, sy1 - sy0);
    int steps = 1 + std::min(12, (int)(seg / std::max(1.0f, rad_px)));
    float alpha = col[3] * life / (float)steps;
    for (int s = 0; s < steps; s++) {
      float t = steps == 1 ? 0.0f : (float)s / (float)(steps - 1);
      float cx = sx0 + (sx1 - sx0) * t;
      float cy = sy0 + (sy1 - sy0) * t;
      float cz = z0 + (z1 - z0) * t;
      int x0 = std::max(0, (int)std::floor(cx - 2 * rad_px));
      int x1 = std::min(r.width - 1, (int)std::ceil(cx + 2 * rad_px));
      int y0 = std::max(0, (int)std::floor(cy - 2 * rad_px));
      int y1 = std::min(r.height - 1, (int)std::ceil(cy + 2 * rad_px));
      float inv2r2 = 1.0f / (2.0f * rad_px * rad_px);
      for (int y = y0; y <= y1; y++)
        for (int x = x0; x <= x1; x++) {
          size_t idx = (size_t)y * r.width + x;
          // depth test with a small bias so spray hugging the surface
          // still shows; no depth write (reference glDepthMask(FALSE))
          if (cz >= r.zbuf[idx] + 0.01f) continue;
          float dx = x + 0.5f - cx, dy = y + 0.5f - cy;
          float w = std::exp(-(dx * dx + dy * dy) * inv2r2);
          float a = alpha * w;
          float* px = &r.rgb[idx * 3];
          for (int c = 0; c < 3; c++)
            px[c] = col[c] * a + px[c] * (1.0f - a);
        }
    }
  }
}

// ---------------- neighbor-grid smoothing / anisotropy --------------------
// The reference obtains smoothed positions + anisotropy ellipsoids from a
// NvFlex solver tick (bindings.cpp:403-418).  Native replacement: uniform
// hash grid; Laplacian position smoothing; per-particle covariance of the
// neighborhood with a 3x3 Jacobi eigensolver (values AND vectors — the
// vectors orient the splat ellipsoids).

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

// cyclic Jacobi on a symmetric 3x3 (xx, yy, zz, xy, xz, yz):
// eigenvalues (descending) + matching eigenvectors (columns of V, 9
// col-major)
void jacobi_eigen3(const float A_in[6], float eig[3], float V[9]) {
  float A[3][3] = {{A_in[0], A_in[3], A_in[4]},
                   {A_in[3], A_in[1], A_in[5]},
                   {A_in[4], A_in[5], A_in[2]}};
  float Vm[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 12; sweep++) {
    float off = std::fabs(A[0][1]) + std::fabs(A[0][2]) + std::fabs(A[1][2]);
    if (off < 1e-12f) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        if (std::fabs(A[p][q]) < 1e-14f) continue;
        float tau = (A[q][q] - A[p][p]) / (2 * A[p][q]);
        float t = (tau >= 0 ? 1.0f : -1.0f) /
                  (std::fabs(tau) + std::sqrt(1 + tau * tau));
        float c = 1.0f / std::sqrt(1 + t * t), s = t * c;
        for (int k = 0; k < 3; k++) {
          float akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          float apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          float vkp = Vm[k][p], vkq = Vm[k][q];
          Vm[k][p] = c * vkp - s * vkq;
          Vm[k][q] = s * vkp + c * vkq;
        }
      }
  }
  int ord[3] = {0, 1, 2};
  float d[3] = {A[0][0], A[1][1], A[2][2]};
  std::sort(ord, ord + 3, [&](int a, int b) { return d[a] > d[b]; });
  for (int k = 0; k < 3; k++) {
    eig[k] = d[ord[k]];
    for (int rrow = 0; rrow < 3; rrow++) V[3 * k + rrow] = Vm[rrow][ord[k]];
  }
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

// fluid-appearance knobs (CompositeShader uniforms in the reference)
void swr_set_fluid_params(float absorption, float refraction,
                          float blur_radius, int blur_iters,
                          float smoke_sigma, int smoke_grid) {
  if (absorption > 0) g->fp.absorption = absorption;
  if (refraction >= 0) g->fp.refraction = refraction;
  if (blur_radius >= 0) g->fp.blur_radius = blur_radius;
  if (blur_iters >= 0) g->fp.blur_iters = blur_iters;
  if (smoke_sigma > 0) g->fp.smoke_sigma = smoke_sigma;
  if (smoke_grid > 0) g->fp.smoke_grid = smoke_grid;
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
  g->aniso_axes.clear();
}

int swr_get_n_particles() { return (int)g->pradius.size(); }

void swr_set_particles_velocity(const float* vel, int n) {
  g->pvel.assign(vel, vel + 3 * (size_t)n);
}

void swr_set_diffuse_params(const float* rgba, float radius, float motion) {
  for (int k = 0; k < 4; k++) g->diffuse_color[k] = rgba[k];
  g->diffuse_radius = radius;
  g->diffuse_motion = motion;
}

// Generate diffuse (spray/foam) sprites from the particle state: a
// particle emits spray when it moves fast AND sits in a thin
// neighborhood (free surface / splash).  This replaces the NvFlex
// diffuse-particle solver output the reference renders
// (bindings.cpp:421-428); emission potential = speed above
// ``speed_thresh`` scaled by (1 - neighbors/max_neighbors).  Sprites
// are jittered deterministically (splitmix-style hash) inside the
// particle radius and inherit the particle velocity.  Returns the
// sprite count.
int swr_compute_diffuse(float radius, float speed_thresh,
                        int max_neighbors, int sprites_per) {
  Renderer& r = *g;
  r.dpos.clear(); r.dvel.clear(); r.dlife.clear();
  size_t n = r.pradius.size();
  if (n == 0 || r.pvel.size() < 3 * n) return 0;
  HashGrid grid;
  grid.build(r.px, r.pused, radius);
  float r2 = radius * radius;
  auto hashf = [](uint64_t h) {
    h += 0x9e3779b97f4a7c15ull;
    h = (h ^ (h >> 30)) * 0xbf58476d1ce4e5b9ull;
    h = (h ^ (h >> 27)) * 0x94d049bb133111ebull;
    h ^= h >> 31;
    return (float)(h & 0xffffff) / (float)0x1000000;  // [0, 1)
  };
  for (size_t i = 0; i < n; i++) {
    if (!r.pused.empty() && !r.pused[i]) continue;
    float vx = r.pvel[3 * i], vy = r.pvel[3 * i + 1], vz = r.pvel[3 * i + 2];
    float speed = std::sqrt(vx * vx + vy * vy + vz * vz);
    if (speed < speed_thresh) continue;
    float cx = r.px[3 * i], cy = r.px[3 * i + 1], cz = r.px[3 * i + 2];
    int gx = clampf(cx / grid.cell, 0, grid.nx - 1);
    int gy = clampf(cy / grid.cell, 0, grid.ny - 1);
    int gz = clampf(cz / grid.cell, 0, grid.nz - 1);
    int cnt = 0;
    for (int dx = -1; dx <= 1 && cnt <= max_neighbors; dx++)
      for (int dy = -1; dy <= 1 && cnt <= max_neighbors; dy++)
        for (int dz = -1; dz <= 1 && cnt <= max_neighbors; dz++) {
          int ax = gx + dx, ay = gy + dy, az = gz + dz;
          if (ax < 0 || ay < 0 || az < 0 || ax >= grid.nx ||
              ay >= grid.ny || az >= grid.nz)
            continue;
          int j = grid.head[((size_t)ax * grid.ny + ay) * grid.nz + az];
          while (j >= 0) {
            float ddx = r.px[3 * j] - cx, ddy = r.px[3 * j + 1] - cy,
                  ddz = r.px[3 * j + 2] - cz;
            if (ddx * ddx + ddy * ddy + ddz * ddz < r2) cnt++;
            j = grid.next[j];
          }
        }
    if (cnt > max_neighbors) continue;  // interior particle: no spray
    float thin = 1.0f - (float)cnt / (float)(max_neighbors + 1);
    float pot = clampf((speed / speed_thresh - 1.0f) * thin, 0.0f, 1.0f);
    if (pot <= 0.0f) continue;
    float prad = r.pradius[i];
    for (int s = 0; s < sprites_per; s++) {
      uint64_t seed = (uint64_t)i * 131071ull + (uint64_t)s;
      float jx = (hashf(seed * 3 + 0) - 0.5f) * 2.0f * prad;
      float jy = (hashf(seed * 3 + 1) - 0.5f) * 2.0f * prad;
      float jz = (hashf(seed * 3 + 2) - 0.5f) * 2.0f * prad;
      r.dpos.insert(r.dpos.end(), {cx + jx, cy + jy, cz + jz});
      r.dvel.insert(r.dvel.end(), {vx, vy, vz});
      r.dlife.push_back(0.35f + 0.65f * pot * hashf(seed ^ 0xabcdefull));
    }
  }
  return (int)(r.dpos.size() / 3);
}

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

// Per-particle anisotropy from the neighborhood covariance (NvFlex
// anisotropy replacement).  out_radii: 3 radii per particle (descending);
// the full oriented half-axes are retained internally and orient the
// screen-space ellipsoid splat.
void swr_compute_anisotropy(float radius, float scale, float* out_radii) {
  size_t n = g->pradius.size();
  HashGrid grid;
  grid.build(g->px, g->pused, radius);
  float r2 = radius * radius;
  g->aniso_axes.assign(n * 9, 0.0f);
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
    float* axes = &g->aniso_axes[9 * i];
    if (cnt >= 4) {
      for (int k = 0; k < 6; k++) C[k] /= cnt;
      float eig[3], V[9];
      jacobi_eigen3(C, eig, V);
      float s0 = std::sqrt(std::max(eig[0], 1e-12f));
      for (int k = 0; k < 3; k++) {
        float sk = std::sqrt(std::max(eig[k], 1e-12f));
        // clamp aspect like typical surface reconstruction
        sk = std::max(sk, 0.25f * s0);
        float rk = clampf(sk * scale, 0.5f * base, 4.0f * base);
        out_radii[3 * i + k] = rk;
        for (int rrow = 0; rrow < 3; rrow++)
          axes[3 * k + rrow] = V[3 * k + rrow] * rk;
      }
    } else {
      out_radii[3 * i] = out_radii[3 * i + 1] = out_radii[3 * i + 2] = base;
      axes[0] = base; axes[4] = base; axes[8] = base;
    }
  }
}

// Render to an RGBA uint8 buffer of size width*height*4.
void swr_render(uint8_t* out_rgba) {
  Renderer& r = *g;
  float f_px = 0.5f * r.height / std::tan(r.cam.fov_deg * (float)M_PI / 360.0f);
  clear_buffers(r);
  build_shadow_map(r);
  draw_floor_plane(r, f_px);
  draw_meshes(r, f_px);
  splat_fluid(r, f_px);
  float mean_rad = 0.008f;
  if (!r.pradius.empty()) {
    double s = 0;
    for (float v : r.pradius) s += v;
    mean_rad = (float)(s / r.pradius.size());
  }
  blur_fluid(r, mean_rad);
  composite_fluid(r, f_px);
  draw_smoke_volumetric(r, f_px);
  draw_diffuse(r, f_px);
  size_t total = (size_t)r.width * r.height;
  for (size_t i = 0; i < total; i++) {
    // gamma for display (the GL pipeline renders to an sRGB target)
    out_rgba[4 * i] = (uint8_t)(std::pow(clampf(r.rgb[3 * i], 0, 1), 1 / 2.2f) * 255.0f);
    out_rgba[4 * i + 1] = (uint8_t)(std::pow(clampf(r.rgb[3 * i + 1], 0, 1), 1 / 2.2f) * 255.0f);
    out_rgba[4 * i + 2] = (uint8_t)(std::pow(clampf(r.rgb[3 * i + 2], 0, 1), 1 / 2.2f) * 255.0f);
    out_rgba[4 * i + 3] = 255;
  }
}

void swr_clean() {
  delete g;
  g = nullptr;
}

} // extern "C"
