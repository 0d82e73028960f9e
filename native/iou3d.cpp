// Exact oriented 3D box intersection-over-union — native eval kernel.
//
// The reference computes this in Python via Sutherland–Hodgman clipping + scipy
// ConvexHull per box pair (objectron/dataset/iou.py:22-100); the Objectron
// evaluation sweeps up to 100 GT rotations per matched box for symmetric
// categories, which makes this the eval harness's CPU hot loop. This C++ version
// computes the intersection volume directly from the clipped boundary with the
// divergence theorem (no hull construction):
//
//   The intersection of two convex polytopes A∩B is bounded by faces of A clipped
//   to B plus faces of B clipped to A. With outward-consistent face orientation,
//   V = (1/6) * Σ_faces Σ_triangles det[v0 v1 v2].
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3 &o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3 &o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
};

using Poly = std::vector<Vec3>;

// Face corner indices (binary corner order, x = high bit, z = low bit), wound so
// the face normal points OUT of the box.
constexpr int kFaces[6][4] = {
    {0, 1, 3, 2},  // x = -sx/2 (normal -x)
    {4, 6, 7, 5},  // x = +sx/2 (normal +x)
    {0, 4, 5, 1},  // y = -sy/2 (normal -y)
    {2, 3, 7, 6},  // y = +sy/2 (normal +y)
    {0, 2, 6, 4},  // z = -sz/2 (normal -z)
    {1, 5, 7, 3},  // z = +sz/2 (normal +z)
};

struct Box {
  // rotation R (row-major, object→world), translation t, half extents h.
  double r[9];
  Vec3 t;
  Vec3 h;

  Vec3 corner(int i) const {
    Vec3 local = {(i & 4) ? h.x : -h.x, (i & 2) ? h.y : -h.y,
                  (i & 1) ? h.z : -h.z};
    return to_world(local);
  }
  Vec3 to_world(const Vec3 &p) const {
    return {r[0] * p.x + r[1] * p.y + r[2] * p.z + t.x,
            r[3] * p.x + r[4] * p.y + r[5] * p.z + t.y,
            r[6] * p.x + r[7] * p.y + r[8] * p.z + t.z};
  }
  Vec3 to_local(const Vec3 &p) const {
    Vec3 d = p - t;
    return {r[0] * d.x + r[3] * d.y + r[6] * d.z,
            r[1] * d.x + r[4] * d.y + r[7] * d.z,
            r[2] * d.x + r[5] * d.y + r[8] * d.z};
  }
  double volume() const { return 8.0 * h.x * h.y * h.z; }
};

// Clip polygon against plane coord[axis] <= bound (keep_below) or >= -bound.
void clip_axis(Poly &poly, int axis, double bound, bool keep_below) {
  if (poly.empty()) return;
  Poly out;
  out.reserve(poly.size() + 4);
  const size_t n = poly.size();
  auto coord = [axis](const Vec3 &v) {
    return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
  };
  for (size_t i = 0; i < n; ++i) {
    const Vec3 &cur = poly[i];
    const Vec3 &nxt = poly[(i + 1) % n];
    bool cin = keep_below ? coord(cur) <= bound : coord(cur) >= bound;
    bool nin = keep_below ? coord(nxt) <= bound : coord(nxt) >= bound;
    if (cin) out.push_back(cur);
    if (cin != nin) {
      double denom = coord(nxt) - coord(cur);
      double tt = std::fabs(denom) > 1e-12 ? (bound - coord(cur)) / denom : 0.0;
      out.push_back(cur + (nxt - cur) * tt);
    }
  }
  poly.swap(out);
}

// Clip a polygon (given in clipper-local coordinates) against the box
// [-h+shrink, h-shrink] in that frame. A tiny shrink on ONE clipping side keeps
// coincident faces (e.g. identical boxes) from being counted by both boundaries.
void clip_to_box(Poly &poly, const Vec3 &h, double shrink) {
  for (int axis = 0; axis < 3; ++axis) {
    double b = (axis == 0 ? h.x : (axis == 1 ? h.y : h.z)) - shrink;
    clip_axis(poly, axis, b, true);
    if (poly.empty()) return;
    clip_axis(poly, axis, -b, false);
    if (poly.empty()) return;
  }
}

// Signed volume contribution of an outward-oriented polygon via the divergence
// theorem: (1/6) Σ det[v0, vi, vi+1].
double face_volume(const Poly &poly) {
  double v = 0.0;
  for (size_t i = 1; i + 1 < poly.size(); ++i) {
    v += poly[0].dot(poly[i].cross(poly[i + 1]));
  }
  return v / 6.0;
}

// Volume of A ∩ B: faces of `a` clipped to `b` plus faces of `b` clipped to `a`,
// each evaluated in world coordinates with outward orientation.
double intersection_volume(const Box &a, const Box &b) {
  double vol = 0.0;
  const Box *boxes[2] = {&a, &b};
  for (int side = 0; side < 2; ++side) {
    const Box &face_box = *boxes[side];
    const Box &clip_box = *boxes[1 - side];
    for (const auto &face : kFaces) {
      // Face polygon in the CLIP box's local frame.
      Poly poly;
      poly.reserve(8);
      for (int k = 0; k < 4; ++k)
        poly.push_back(clip_box.to_local(face_box.corner(face[k])));
      // side 0 clips against a hair-EXPANDED box so numerically-coincident
      // faces survive intact; side 1 clips against a hair-SHRUNK box so the
      // same coincident boundary is never counted twice.
      clip_to_box(poly, clip_box.h, side == 1 ? 1e-9 : -1e-9);
      if (poly.size() < 3) continue;
      // Back to world for a consistent volume origin.
      Poly world;
      world.reserve(poly.size());
      for (const auto &p : poly) world.push_back(clip_box.to_world(p));
      vol += face_volume(world);
    }
  }
  return vol;
}

Box make_box(const double *r, const double *t, const double *s) {
  Box b;
  std::memcpy(b.r, r, 9 * sizeof(double));
  b.t = {t[0], t[1], t[2]};
  b.h = {s[0] / 2.0, s[1] / 2.0, s[2] / 2.0};
  return b;
}

}  // namespace

extern "C" {

// IoU of two oriented boxes. r: 3x3 row-major, t: 3, s: full extents 3.
double iou3d(const double *r1, const double *t1, const double *s1,
             const double *r2, const double *t2, const double *s2) {
  Box a = make_box(r1, t1, s1);
  Box b = make_box(r2, t2, s2);
  double inter = intersection_volume(a, b);
  if (inter <= 0.0) return 0.0;
  double uni = a.volume() + b.volume() - inter;
  if (uni <= 0.0) return 0.0;
  double iou = inter / uni;
  return iou < 0.0 ? 0.0 : (iou > 1.0 ? 1.0 : iou);
}

// Max IoU over n rotations of box2 about its local y axis (symmetry sweep).
double iou3d_symmetry_sweep(const double *r1, const double *t1,
                            const double *s1, const double *r2,
                            const double *t2, const double *s2, int n) {
  if (n <= 1) return iou3d(r1, t1, s1, r2, t2, s2);
  Box a = make_box(r1, t1, s1);
  double best = 0.0;
  for (int i = 0; i < n; ++i) {
    double th = 2.0 * M_PI * i / n;
    double c = std::cos(th), sn = std::sin(th);
    // R2' = R2 @ Ry(th)
    double ry[9] = {c, 0, sn, 0, 1, 0, -sn, 0, c};
    double r2r[9];
    for (int row = 0; row < 3; ++row)
      for (int col = 0; col < 3; ++col)
        r2r[row * 3 + col] = r2[row * 3 + 0] * ry[0 * 3 + col] +
                             r2[row * 3 + 1] * ry[1 * 3 + col] +
                             r2[row * 3 + 2] * ry[2 * 3 + col];
    Box b = make_box(r2r, t2, s2);
    double inter = intersection_volume(a, b);
    if (inter > 0.0) {
      double uni = a.volume() + b.volume() - inter;
      double iou = uni > 0.0 ? inter / uni : 0.0;
      if (iou > best) best = iou;
    }
  }
  return best > 1.0 ? 1.0 : best;
}

}  // extern "C"
