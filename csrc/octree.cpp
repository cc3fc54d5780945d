// Native Barnes–Hut octree gravity solver (CPU runtime component).
//
// TPU-native re-design of the reference Rust crates
// (`crates/gravity/src/tree.rs`, `multipole.rs`, `direct.rs` — studied for
// behaviour, written from scratch in C++):
//
//   * octree build with particle reordering (leaves own contiguous ranges),
//   * stack-free DFS traversal links (first_child / next_branch),
//   * bottom-up payloads: mass, COM, hmax, factorial-normalized Cartesian
//     multipole moments to order 5 with exact M2M translation,
//   * far-field evaluation via machine-generated exact derivative tables of
//     1/r (csrc/multipole_tables.h, see tools/gen_multipole.py),
//   * Plummer / cubic-spline-W2 softening kernels with the admissibility
//     rule r > c·hmax (c = 2.8 Plummer, 1.0 spline),
//   * std::thread parallelism over targets (the `threads` knob).
//
// Semantics match the reference: opening criterion size² < θ²·|t−com|²;
// leaf pair softening h = max(h_target, h_source); self-interaction skipped
// by original particle index.  The TPU compute path remains the Pallas
// dense kernel (pallas_direct.py) — this solver covers the O(N log N)
// regime and CPU deployments.
//
// Build: g++ -O3 -fPIC -shared -std=c++17 -o libpnx_octree.so octree.cpp -lpthread

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include "hilbert_tables.h"
#include "multipole_tables.h"

namespace {

constexpr double R2_TINY = 1e-300;

// ---------------------------------------------------------------------------
// Softening kernels (Springel 2005 eq. 71 piecewise quintic + Plummer)
// ---------------------------------------------------------------------------

enum Kernel { KERNEL_NONE = 0, KERNEL_PLUMMER = 1, KERNEL_SPLINE = 2 };

inline double w2(double u) {
  if (u < 0.5) {
    double u2 = u * u, u4 = u2 * u2, u5 = u4 * u;
    return (16.0 / 3.0) * u2 - (48.0 / 5.0) * u4 + (32.0 / 5.0) * u5 -
           14.0 / 5.0;
  } else if (u < 1.0) {
    double u2 = u * u, u3 = u2 * u, u4 = u2 * u2, u5 = u4 * u;
    return (1.0 / 15.0) / u + (32.0 / 3.0) * u2 - 16.0 * u3 +
           (48.0 / 5.0) * u4 - (32.0 / 15.0) * u5 - 16.0 / 5.0;
  }
  return -1.0 / u;
}

inline double w2_prime(double u) {
  if (u < 0.5) {
    double u2 = u * u, u3 = u2 * u, u4 = u2 * u2;
    return (32.0 / 3.0) * u - (192.0 / 5.0) * u3 + 32.0 * u4;
  } else if (u < 1.0) {
    double u2 = u * u, u3 = u2 * u, u4 = u2 * u2;
    return -(1.0 / 15.0) / u2 + (64.0 / 3.0) * u - 48.0 * u2 +
           (192.0 / 5.0) * u3 - (32.0 / 3.0) * u4;
  }
  return 1.0 / (u * u);
}

inline double kernel_phi(int kind, double r, double h) {
  if (r == 0.0) return 0.0;
  switch (kind) {
    case KERNEL_PLUMMER:
      return -1.0 / std::sqrt(r * r + h * h);
    case KERNEL_SPLINE:
      if (h <= 0.0) return -1.0 / r;
      return w2(r / h) / h;
    default:
      return -1.0 / r;
  }
}

// accel factor g with a = m * (src - tgt) * g
inline double kernel_g(int kind, double r, double h) {
  if (r == 0.0) return 0.0;
  switch (kind) {
    case KERNEL_PLUMMER: {
      double s2 = r * r + h * h;
      return 1.0 / (std::sqrt(s2) * s2);
    }
    case KERNEL_SPLINE:
      if (h <= 0.0) return 1.0 / (r * r * r);
      return w2_prime(r / h) / (h * h * r);
    default:
      return 1.0 / (r * r * r);
  }
}

inline double soft_sep_factor(int kind) {
  switch (kind) {
    case KERNEL_PLUMMER:
      return 2.8;
    case KERNEL_SPLINE:
      return 1.0;
    default:
      return 0.0;
  }
}

// ---------------------------------------------------------------------------
// Multipole helpers (generated tables)
// ---------------------------------------------------------------------------

// number of multi-indices with total order <= L
inline int n_indices(int L) { return (L + 1) * (L + 2) * (L + 3) / 6; }

// position of multi-index (i,j,k) in the canonical generated ordering
static int INDEX_POS[PNX_MAX_ORDER + 1][PNX_MAX_ORDER + 1]
                    [PNX_MAX_ORDER + 1];
static bool index_pos_ready = false;

void init_index_pos() {
  if (index_pos_ready) return;
  for (int p = 0; p < PNX_N_INDICES; ++p) {
    const pnx_index_entry &e = PNX_INDEX[p];
    INDEX_POS[e.i][e.j][e.k] = p;
  }
  index_pos_ready = true;
}

// evaluate D_n for all |n| <= L at displacement (x,y,z); out has n_indices(L)
inline void eval_derivs(double x, double y, double z, int L, double *out) {
  double xp[PNX_MAX_ORDER + 1], yp[PNX_MAX_ORDER + 1],
      zp[PNX_MAX_ORDER + 1];
  xp[0] = yp[0] = zp[0] = 1.0;
  for (int i = 1; i <= PNX_MAX_ORDER; ++i) {
    xp[i] = xp[i - 1] * x;
    yp[i] = yp[i - 1] * y;
    zp[i] = zp[i - 1] * z;
  }
  double r2 = x * x + y * y + z * z;
  double rinv = 1.0 / std::sqrt(r2);
  double rinv_pow[2 * PNX_MAX_ORDER + 2];
  rinv_pow[0] = 1.0;
  for (int i = 1; i <= 2 * PNX_MAX_ORDER + 1; ++i)
    rinv_pow[i] = rinv_pow[i - 1] * rinv;
  int np = n_indices(L);
  for (int p = 0; p < np; ++p) {
    const pnx_index_entry &e = PNX_INDEX[p];
    double acc = 0.0;
    for (int t = 0; t < e.count; ++t) {
      const pnx_term &tm = PNX_TERMS[e.offset + t];
      acc += tm.coef * xp[tm.a] * yp[tm.b] * zp[tm.c] * rinv_pow[tm.m];
    }
    out[p] = acc;
  }
}

// ---------------------------------------------------------------------------
// Octree
// ---------------------------------------------------------------------------

struct Node {
  double center[3];
  double half;     // half side length
  double size2;    // (2*half)^2
  double com[3];
  double mass;
  double hmax;
  int32_t first_child;   // -1 for leaf
  int32_t next_branch;   // next node in DFS skipping this subtree (-1 end)
  int32_t pstart, pcount;  // contiguous particle range (leaves)
};

struct Tree {
  std::vector<Node> nodes;
  // particle data reordered in tree order
  std::vector<double> px, py, pz, pm, ph;
  std::vector<int64_t> orig_index;
  int order = 0;       // multipole order (0 => monopole only)
  int kernel = KERNEL_NONE;
  bool has_soft = false;
  long n = 0;
  // multipole moments per node: n_indices(order) doubles each (about COM)
  std::vector<double> moments;
  int nmom = 0;

  // signs (-1)^{|n|} per index position, cached
  std::vector<double> sign;

  // cached per-block interaction lists (device-evaluation handoff)
  long bl_block_size = 0;   // 0 => per-leaf blocks
  double bl_theta = -1.0;
  std::vector<std::vector<int32_t>> bl_nodes;     // accepted node ids
  std::vector<std::vector<int32_t>> bl_leaf_idx;  // near-field LEAF seq ids
  std::vector<int32_t> bl_start, bl_count;        // target ranges per block
  std::vector<int32_t> leaf_seq;                  // node id -> leaf seq (-1)
  std::vector<int32_t> leaf_node_ids;             // leaf seq -> node id

  // cached two-level lists: group-level far lists shared by G consecutive
  // leaves + residual per-leaf lists (see build_group_lists)
  long gl_group_leaves = 0;
  double gl_theta = -1.0;
  std::vector<std::vector<int32_t>> gl_gnodes;    // per-group far node ids
  std::vector<std::vector<int32_t>> gl_lnodes;    // per-leaf residual nodes
  std::vector<std::vector<int32_t>> gl_lleaf;     // per-leaf near LEAF seqs
  std::vector<int32_t> gl_gstart, gl_gcount;      // particle range per group
  // per-group UNION near lists: each entry is a leaf seq + a bitmask of
  // which member leaves list it (device fetches each tile once per GROUP)
  std::vector<std::vector<int32_t>> gl_gnear;     // per-group leaf seqs
  std::vector<std::vector<int32_t>> gl_gnearbits; // matching member bitmasks
};

// recursive builder: subdivide [start,end) of the reorder buffer.
// hstate: Hilbert-curve orientation state for this node's child octant
// enumeration (csrc/hilbert_tables.h), or -1 for plain Z/Morton order.
// A Hilbert DFS keeps spatially adjacent leaves adjacent in sequence id,
// which shortens the device engines' near-field window lists and makes
// G-consecutive-leaf far groups more compact; traversal semantics are
// unchanged (child visit order never affects BH acceptance).
void build_rec(Tree &t, std::vector<int64_t> &idx,
               const double *pos,  // original positions (n,3)
               long start, long end, double cx, double cy, double cz,
               double half, int leaf_capacity, int depth, int hstate) {
  int32_t me = (int32_t)t.nodes.size();
  t.nodes.push_back(Node());
  Node &node = t.nodes[me];
  node.center[0] = cx;
  node.center[1] = cy;
  node.center[2] = cz;
  node.half = half;
  node.size2 = 4.0 * half * half;
  node.first_child = -1;
  node.next_branch = -1;
  node.pstart = (int32_t)start;
  node.pcount = (int32_t)(end - start);

  if (end - start <= leaf_capacity || depth > 60) return;  // leaf

  // partition the index range into 8 octants (counting sort), keyed by
  // the child VISIT rank so subtree particle ranges stay in DFS order
  const uint8_t *rank = hstate >= 0 ? HILBERT_RANK[hstate] : nullptr;
  long counts[8] = {0};
  std::vector<uint8_t> oct(end - start);
  for (long i = start; i < end; ++i) {
    const double *p = pos + 3 * idx[i];
    int o = (p[0] >= cx ? 1 : 0) | (p[1] >= cy ? 2 : 0) | (p[2] >= cz ? 4 : 0);
    int r = rank ? rank[o] : o;
    oct[i - start] = (uint8_t)r;
    counts[r]++;
  }
  long offs[9];
  offs[0] = 0;
  for (int o = 0; o < 8; ++o) offs[o + 1] = offs[o] + counts[o];
  std::vector<int64_t> tmp(end - start);
  long cursor[8];
  for (int o = 0; o < 8; ++o) cursor[o] = offs[o];
  for (long i = start; i < end; ++i) tmp[cursor[oct[i - start]]++] = idx[i];
  std::copy(tmp.begin(), tmp.end(), idx.begin() + start);

  double q = half * 0.5;
  bool made_child = false;
  for (int j = 0; j < 8; ++j) {
    long a = start + offs[j], b = start + offs[j + 1];
    if (a == b) continue;
    int o = hstate >= 0 ? HILBERT_ORDER[hstate][j] : j;  // geometric octant
    double ncx = cx + ((o & 1) ? q : -q);
    double ncy = cy + ((o & 2) ? q : -q);
    double ncz = cz + ((o & 4) ? q : -q);
    int32_t child = (int32_t)t.nodes.size();
    if (!made_child) {
      t.nodes[me].first_child = child;
      made_child = true;
    }
    build_rec(t, idx, pos, a, b, ncx, ncy, ncz, q, leaf_capacity, depth + 1,
              hstate >= 0 ? (int)HILBERT_STATE[hstate][j] : -1);
  }
}

// set next_branch links.  DFS construction emits every subtree contiguously
// and particle ranges nest, so the subtree of node i ends at the first node
// k > i whose particle range lies outside i's — a single stack pass.
void set_links(Tree &t) {
  int32_t nn = (int32_t)t.nodes.size();
  std::vector<int32_t> stack;
  for (int32_t i = 0; i < nn; ++i) {
    Node &node = t.nodes[i];
    while (!stack.empty()) {
      Node &top = t.nodes[stack.back()];
      if (node.pstart >= top.pstart + top.pcount) {
        t.nodes[stack.back()].next_branch = i;
        stack.pop_back();
      } else {
        break;
      }
    }
    stack.push_back(i);
  }
  while (!stack.empty()) {
    t.nodes[stack.back()].next_branch = -1;
    stack.pop_back();
  }
}

// bottom-up payloads: mass/COM/hmax/moments.  Children of a node are the
// consecutive subtrees starting at first_child; iterate nodes in reverse
// construction order so children are done before parents.
void build_payloads(Tree &t) {
  init_index_pos();
  int nm = n_indices(t.order);
  t.nmom = nm;
  t.moments.assign(t.nodes.size() * nm, 0.0);
  t.sign.resize(nm);
  for (int p = 0; p < nm; ++p) {
    const pnx_index_entry &e = PNX_INDEX[p];
    t.sign[p] = ((e.i + e.j + e.k) % 2 == 0) ? 1.0 : -1.0;
  }
  // factorials
  double fact[PNX_MAX_ORDER + 1];
  fact[0] = 1.0;
  for (int i = 1; i <= PNX_MAX_ORDER; ++i) fact[i] = fact[i - 1] * i;

  for (int32_t i = (int32_t)t.nodes.size() - 1; i >= 0; --i) {
    Node &node = t.nodes[i];
    if (node.first_child < 0) {
      // leaf: P2M
      double m = 0, cx = 0, cy = 0, cz = 0, hm = 0;
      for (int32_t k = node.pstart; k < node.pstart + node.pcount; ++k) {
        m += t.pm[k];
        cx += t.pm[k] * t.px[k];
        cy += t.pm[k] * t.py[k];
        cz += t.pm[k] * t.pz[k];
        if (t.has_soft) hm = std::max(hm, t.ph[k]);
      }
      node.mass = m;
      double inv = m > 0 ? 1.0 / m : 0.0;
      node.com[0] = m > 0 ? cx * inv : node.center[0];
      node.com[1] = m > 0 ? cy * inv : node.center[1];
      node.com[2] = m > 0 ? cz * inv : node.center[2];
      node.hmax = hm;
      if (t.order > 0) {
        double *M = &t.moments[(size_t)i * nm];
        for (int32_t k = node.pstart; k < node.pstart + node.pcount; ++k) {
          double dx = t.px[k] - node.com[0];
          double dy = t.py[k] - node.com[1];
          double dz = t.pz[k] - node.com[2];
          double xp[PNX_MAX_ORDER + 1], yp[PNX_MAX_ORDER + 1],
              zp[PNX_MAX_ORDER + 1];
          xp[0] = yp[0] = zp[0] = 1.0;
          for (int q = 1; q <= t.order; ++q) {
            xp[q] = xp[q - 1] * dx;
            yp[q] = yp[q - 1] * dy;
            zp[q] = zp[q - 1] * dz;
          }
          for (int p = 0; p < nm; ++p) {
            const pnx_index_entry &e = PNX_INDEX[p];
            M[p] += t.pm[k] * xp[e.i] * yp[e.j] * zp[e.k] /
                    (fact[e.i] * fact[e.j] * fact[e.k]);
          }
        }
      }
    } else {
      // internal: combine children (consecutive subtrees from first_child)
      double m = 0, cx = 0, cy = 0, cz = 0, hm = 0;
      int32_t c = node.first_child;
      while (c >= 0 && t.nodes[c].pstart < node.pstart + node.pcount &&
             t.nodes[c].pstart >= node.pstart) {
        Node &ch = t.nodes[c];
        m += ch.mass;
        cx += ch.mass * ch.com[0];
        cy += ch.mass * ch.com[1];
        cz += ch.mass * ch.com[2];
        hm = std::max(hm, ch.hmax);
        c = ch.next_branch;
        if (c < 0) break;
      }
      node.mass = m;
      double inv = m > 0 ? 1.0 / m : 0.0;
      node.com[0] = m > 0 ? cx * inv : node.center[0];
      node.com[1] = m > 0 ? cy * inv : node.center[1];
      node.com[2] = m > 0 ? cz * inv : node.center[2];
      node.hmax = hm;
      if (t.order > 0) {
        // M2M: child moments about child COM -> parent COM
        double *M = &t.moments[(size_t)i * nm];
        c = node.first_child;
        while (c >= 0 && t.nodes[c].pstart >= node.pstart &&
               t.nodes[c].pstart < node.pstart + node.pcount) {
          Node &ch = t.nodes[c];
          const double *MB = &t.moments[(size_t)c * nm];
          double d[3] = {ch.com[0] - node.com[0], ch.com[1] - node.com[1],
                         ch.com[2] - node.com[2]};
          double xp[PNX_MAX_ORDER + 1], yp[PNX_MAX_ORDER + 1],
              zp[PNX_MAX_ORDER + 1];
          xp[0] = yp[0] = zp[0] = 1.0;
          for (int q = 1; q <= t.order; ++q) {
            xp[q] = xp[q - 1] * d[0];
            yp[q] = yp[q - 1] * d[1];
            zp[q] = zp[q - 1] * d[2];
          }
          for (int p = 0; p < nm; ++p) {
            const pnx_index_entry &e = PNX_INDEX[p];
            double tot = 0.0;
            for (int a = 0; a <= e.i; ++a)
              for (int b = 0; b <= e.j; ++b)
                for (int g = 0; g <= e.k; ++g) {
                  int src = INDEX_POS[a][b][g];
                  tot += MB[src] * xp[e.i - a] * yp[e.j - b] * zp[e.k - g] /
                         (fact[e.i - a] * fact[e.j - b] * fact[e.k - g]);
                }
            M[p] += tot;
          }
          c = ch.next_branch;
          if (c < 0) break;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Traversal
// ---------------------------------------------------------------------------

struct TraversalCtx {
  double theta2;
  double soft_factor;  // admissibility c (0 => no softening restriction)
  int64_t skip;        // original index to skip (-1: none)
  double target_h;     // softening of the target (self-set); 0 at-points
};

inline bool soft_ok(double r2, double h, double c) {
  if (h <= 0.0 || c <= 0.0) return true;
  double ch = c * h;
  return r2 > ch * ch;
}

double potential_at(const Tree &t, double tx, double ty, double tz,
                    const TraversalCtx &ctx) {
  double phi = 0.0;
  double derivs[PNX_N_INDICES];
  int32_t nodei = 0;
  while (nodei >= 0) {
    const Node &node = t.nodes[nodei];
    double dx = tx - node.com[0];
    double dy = ty - node.com[1];
    double dz = tz - node.com[2];
    double dist2 = dx * dx + dy * dy + dz * dz + R2_TINY;
    // admissibility uses max(node hmax, target softening) — a node is only
    // far enough when it clears BOTH softening scales (reference
    // tree.rs:56-70 node_soft_ok semantics)
    bool ok = soft_ok(dist2, std::max(node.hmax, ctx.target_h),
                      ctx.soft_factor) &&
              node.size2 < ctx.theta2 * dist2;
    if (ok) {
      if (t.order == 0) {
        phi -= node.mass / std::sqrt(dist2);
      } else {
        const double *M = &t.moments[(size_t)nodei * t.nmom];
        phi -= pnx_phi_mp(t.order, dx, dy, dz, M);
      }
      nodei = node.next_branch;
    } else if (node.first_child < 0) {
      // leaf: direct sum
      for (int32_t k = node.pstart; k < node.pstart + node.pcount; ++k) {
        if (t.orig_index[k] == ctx.skip) continue;
        double ddx = t.px[k] - tx;
        double ddy = t.py[k] - ty;
        double ddz = t.pz[k] - tz;
        double r2 = ddx * ddx + ddy * ddy + ddz * ddz;
        double r = std::sqrt(r2 + R2_TINY);
        double h = t.has_soft ? std::max(ctx.target_h, t.ph[k])
                              : ctx.target_h;
        phi += t.pm[k] * kernel_phi(h > 0 ? t.kernel : KERNEL_NONE, r, h);
      }
      nodei = node.next_branch;
    } else {
      nodei = node.first_child;
    }
  }
  return phi;
}

void acceleration_at(const Tree &t, double tx, double ty, double tz,
                     const TraversalCtx &ctx, double *out) {
  double ax = 0, ay = 0, az = 0;
  double derivs[PNX_N_INDICES];
  int32_t nodei = 0;
  init_index_pos();
  while (nodei >= 0) {
    const Node &node = t.nodes[nodei];
    double dx = tx - node.com[0];
    double dy = ty - node.com[1];
    double dz = tz - node.com[2];
    double dist2 = dx * dx + dy * dy + dz * dz + R2_TINY;
    bool ok = soft_ok(dist2, std::max(node.hmax, ctx.target_h),
                      ctx.soft_factor) &&
              node.size2 < ctx.theta2 * dist2;
    if (ok) {
      if (t.order == 0) {
        double r = std::sqrt(dist2);
        double g = node.mass / (r * dist2);
        ax -= dx * g;
        ay -= dy * g;
        az -= dz * g;
      } else {
        // a_i = +sum_n M_n (-1)^{|n|} D_{n+e_i}(d) — unrolled evaluator
        const double *M = &t.moments[(size_t)nodei * t.nmom];
        double a3[3];
        pnx_acc_mp(t.order, dx, dy, dz, M, a3);
        ax += a3[0];
        ay += a3[1];
        az += a3[2];
      }
      nodei = node.next_branch;
    } else if (node.first_child < 0) {
      for (int32_t k = node.pstart; k < node.pstart + node.pcount; ++k) {
        if (t.orig_index[k] == ctx.skip) continue;
        double ddx = t.px[k] - tx;
        double ddy = t.py[k] - ty;
        double ddz = t.pz[k] - tz;
        double r2 = ddx * ddx + ddy * ddy + ddz * ddz;
        double r = std::sqrt(r2 + R2_TINY);
        double h = t.has_soft ? std::max(ctx.target_h, t.ph[k])
                              : ctx.target_h;
        double g =
            t.pm[k] * kernel_g(h > 0 ? t.kernel : KERNEL_NONE, r, h);
        ax += ddx * g;
        ay += ddy * g;
        az += ddz * g;
      }
      nodei = node.next_branch;
    } else {
      nodei = node.first_child;
    }
  }
  out[0] = ax;
  out[1] = ay;
  out[2] = az;
}

// ---------------------------------------------------------------------------
// Block interaction lists: one conservative traversal per target block so an
// accelerator can evaluate (block targets × accepted nodes) and
// (block targets × leaf particles) as dense batched ops.
// ---------------------------------------------------------------------------

void parallel_for_impl(long n, int threads,
                       const std::function<void(long, long)> &body);

void build_block_lists(Tree &t, long block_size, double theta) {
  if (t.bl_block_size == block_size && t.bl_theta == theta &&
      !t.bl_nodes.empty())
    return;
  t.bl_start.clear();
  t.bl_count.clear();
  // leaf sequence numbering (near-field lists reference whole leaves so the
  // device can gather contiguous leaf tiles instead of single particles)
  t.leaf_seq.assign(t.nodes.size(), -1);
  t.leaf_node_ids.clear();
  for (size_t i = 0; i < t.nodes.size(); ++i) {
    if (t.nodes[i].first_child < 0 && t.nodes[i].pcount > 0) {
      t.leaf_seq[i] = (int32_t)t.leaf_node_ids.size();
      t.leaf_node_ids.push_back((int32_t)i);
    }
  }
  if (block_size <= 0) {
    // per-leaf blocks: always spatially compact target groups
    for (size_t i = 0; i < t.nodes.size(); ++i) {
      if (t.nodes[i].first_child < 0 && t.nodes[i].pcount > 0) {
        t.bl_start.push_back(t.nodes[i].pstart);
        t.bl_count.push_back(t.nodes[i].pcount);
      }
    }
  } else {
    for (long p = 0; p < t.n; p += block_size) {
      t.bl_start.push_back((int32_t)p);
      t.bl_count.push_back((int32_t)std::min<long>(block_size, t.n - p));
    }
  }
  long nb = (long)t.bl_start.size();
  t.bl_nodes.assign(nb, {});
  t.bl_leaf_idx.assign(nb, {});
  double theta2 = theta * theta;
  double c_soft = t.has_soft ? soft_sep_factor(t.kernel) : 0.0;

  // per-block traversals are independent (disjoint writes) → thread pool
  // (reference parity: rayon par_iter over targets, tree.rs:1443-1547)
  parallel_for_impl(nb, 0, [&](long b_lo, long b_hi) {
  for (long b = b_lo; b < b_hi; ++b) {
    long p0 = t.bl_start[b];
    long p1 = p0 + t.bl_count[b];
    // block bounding sphere (tree-order blocks are spatially compact)
    double lo[3] = {t.px[p0], t.py[p0], t.pz[p0]};
    double hi[3] = {lo[0], lo[1], lo[2]};
    for (long k = p0 + 1; k < p1; ++k) {
      lo[0] = std::min(lo[0], t.px[k]);
      hi[0] = std::max(hi[0], t.px[k]);
      lo[1] = std::min(lo[1], t.py[k]);
      hi[1] = std::max(hi[1], t.py[k]);
      lo[2] = std::min(lo[2], t.pz[k]);
      hi[2] = std::max(hi[2], t.pz[k]);
    }
    double cb[3] = {0.5 * (lo[0] + hi[0]), 0.5 * (lo[1] + hi[1]),
                    0.5 * (lo[2] + hi[2])};
    double rb2 = 0.0;
    for (long k = p0; k < p1; ++k) {
      double dx = t.px[k] - cb[0], dy = t.py[k] - cb[1],
             dz = t.pz[k] - cb[2];
      rb2 = std::max(rb2, dx * dx + dy * dy + dz * dz);
    }
    double rb = std::sqrt(rb2);
    // max target softening in the block: admissibility must clear it too
    double bh = 0.0;
    if (t.has_soft)
      for (long k = p0; k < p1; ++k) bh = std::max(bh, t.ph[k]);

    std::vector<int32_t> &nlist = t.bl_nodes[b];
    std::vector<int32_t> &plist = t.bl_leaf_idx[b];
    int32_t nodei = 0;
    while (nodei >= 0) {
      const Node &node = t.nodes[nodei];
      double dx = cb[0] - node.com[0];
      double dy = cb[1] - node.com[1];
      double dz = cb[2] - node.com[2];
      double d = std::sqrt(dx * dx + dy * dy + dz * dz);
      double dmin = d - rb;  // closest any block target can be to the COM
      // containment guard: never accept a node whose cube can overlap the
      // block (the bare BH criterion admits self-containing cells for
      // θ > 1/√3, poisoning the far field with self-interactions)
      double ox = std::abs(cb[0] - node.center[0]);
      double oy = std::abs(cb[1] - node.center[1]);
      double oz = std::abs(cb[2] - node.center[2]);
      double reach = node.half + rb;
      bool outside = ox > reach || oy > reach || oz > reach;
      double h_eff = std::max(node.hmax, bh);
      bool ok = outside && dmin > 0.0 &&
                node.size2 < theta2 * dmin * dmin &&
                (c_soft <= 0.0 || h_eff <= 0.0 || dmin > c_soft * h_eff);
      if (ok) {
        nlist.push_back(nodei);
        nodei = node.next_branch;
      } else if (node.first_child < 0) {
        if (node.pcount > 0) plist.push_back(t.leaf_seq[nodei]);
        nodei = node.next_branch;
      } else {
        nodei = node.first_child;
      }
    }
  }
  });
  t.bl_block_size = block_size;
  t.bl_theta = theta;
}

// number the leaves (shared by both list builders)
void ensure_leaf_numbering(Tree &t) {
  if (!t.leaf_node_ids.empty()) return;
  t.leaf_seq.assign(t.nodes.size(), -1);
  for (size_t i = 0; i < t.nodes.size(); ++i) {
    if (t.nodes[i].first_child < 0 && t.nodes[i].pcount > 0) {
      t.leaf_seq[i] = (int32_t)t.leaf_node_ids.size();
      t.leaf_node_ids.push_back((int32_t)i);
    }
  }
}

// ---------------------------------------------------------------------------
// Two-level interaction lists: a far-field node list shared by a GROUP of G
// consecutive leaves + residual per-leaf node lists + per-leaf near lists.
//
// The device far field's wall is the node-payload gather volume
// (blocks × ⟨list⟩ rows); accepting distant nodes once per GROUP divides
// that volume by ~G for the far part of the list while per-leaf residual
// lists stay short (only nodes between the leaf and group admissibility
// scales).  Exact partition: a node accepted at group level is flagged and
// its subtree skipped in the leaf traversals, so every (target, source)
// pair is counted exactly once.  (Dual-tree dedup sketch, CLAUDE.md
// round-1 notes; traversal semantics match tree.rs:1126-1331.)
// ---------------------------------------------------------------------------

void build_group_lists(Tree &t, long group_leaves, double theta) {
  if (t.gl_group_leaves == group_leaves && t.gl_theta == theta &&
      !t.gl_lleaf.empty())
    return;
  ensure_leaf_numbering(t);
  long n_leaves = (long)t.leaf_node_ids.size();
  long G = std::max<long>(1, group_leaves);
  long n_groups = (n_leaves + G - 1) / G;
  double theta2 = theta * theta;
  double c_soft = t.has_soft ? soft_sep_factor(t.kernel) : 0.0;
  t.gl_gnodes.assign(n_groups, {});
  t.gl_lnodes.assign(n_leaves, {});
  t.gl_lleaf.assign(n_leaves, {});
  t.gl_gstart.assign(n_groups, 0);
  t.gl_gcount.assign(n_groups, 0);
  t.gl_gnear.assign(n_groups, {});
  t.gl_gnearbits.assign(n_groups, {});
  // bounding sphere + max softening of a particle range
  auto sphere_of = [&](long p0, long p1, double cb[3], double &rb,
                       double &bh) {
    double lo[3] = {t.px[p0], t.py[p0], t.pz[p0]};
    double hi[3] = {lo[0], lo[1], lo[2]};
    for (long k = p0 + 1; k < p1; ++k) {
      lo[0] = std::min(lo[0], t.px[k]);
      hi[0] = std::max(hi[0], t.px[k]);
      lo[1] = std::min(lo[1], t.py[k]);
      hi[1] = std::max(hi[1], t.py[k]);
      lo[2] = std::min(lo[2], t.pz[k]);
      hi[2] = std::max(hi[2], t.pz[k]);
    }
    cb[0] = 0.5 * (lo[0] + hi[0]);
    cb[1] = 0.5 * (lo[1] + hi[1]);
    cb[2] = 0.5 * (lo[2] + hi[2]);
    double rb2 = 0.0;
    for (long k = p0; k < p1; ++k) {
      double dx = t.px[k] - cb[0], dy = t.py[k] - cb[1],
             dz = t.pz[k] - cb[2];
      rb2 = std::max(rb2, dx * dx + dy * dy + dz * dz);
    }
    rb = std::sqrt(rb2);
    bh = 0.0;
    if (t.has_soft)
      for (long k = p0; k < p1; ++k) bh = std::max(bh, t.ph[k]);
  };

  // block admissibility (identical criterion to build_block_lists)
  auto accept = [&](const Node &node, const double cb[3], double rb,
                    double bh) -> bool {
    double dx = cb[0] - node.com[0];
    double dy = cb[1] - node.com[1];
    double dz = cb[2] - node.com[2];
    double dmin = std::sqrt(dx * dx + dy * dy + dz * dz) - rb;
    double ox = std::abs(cb[0] - node.center[0]);
    double oy = std::abs(cb[1] - node.center[1]);
    double oz = std::abs(cb[2] - node.center[2]);
    double reach = node.half + rb;
    bool outside = ox > reach || oy > reach || oz > reach;
    double h_eff = std::max(node.hmax, bh);
    return outside && dmin > 0.0 && node.size2 < theta2 * dmin * dmin &&
           (c_soft <= 0.0 || h_eff <= 0.0 || dmin > c_soft * h_eff);
  };

  // per-group traversals write disjoint slices (group g, leaves [gG, gG+G))
  // → thread pool with per-thread flag scratch (reference parity: rayon)
  parallel_for_impl(n_groups, 0, [&](long g_lo, long g_hi) {
  // gflag: node accepted at group level (leaf traversal skips its subtree).
  // aflag: node whose subtree CONTAINS a group-accepted node — the leaf
  // traversal must descend through it, never accept it (leaf admissibility
  // is weaker than group admissibility, so such an ancestor could otherwise
  // be re-accepted wholesale → double count).  Only the thin spine of
  // ancestors of accepted nodes is constrained; everything else follows
  // normal BH acceptance.
  std::vector<uint8_t> gflag(t.nodes.size(), 0);
  std::vector<uint8_t> aflag(t.nodes.size(), 0);
  std::vector<int32_t> marked;   // aflag ids to reset per group
  std::vector<int32_t> ancestors;  // current traversal path (opened nodes)
  for (long g = g_lo; g < g_hi; ++g) {
    long l0 = g * G, l1 = std::min(n_leaves, l0 + G);
    const Node &first = t.nodes[t.leaf_node_ids[l0]];
    const Node &last = t.nodes[t.leaf_node_ids[l1 - 1]];
    long p0 = first.pstart, p1 = last.pstart + last.pcount;
    t.gl_gstart[g] = (int32_t)p0;
    t.gl_gcount[g] = (int32_t)(p1 - p0);
    double cbg[3], rbg, bhg;
    sphere_of(p0, p1, cbg, rbg, bhg);

    std::vector<int32_t> &glist = t.gl_gnodes[g];
    marked.clear();
    ancestors.clear();
    int32_t nodei = 0;
    while (nodei >= 0) {
      const Node &node = t.nodes[nodei];
      // pop ancestors whose particle range no longer contains this node
      while (!ancestors.empty()) {
        const Node &top = t.nodes[ancestors.back()];
        if (node.pstart >= top.pstart + top.pcount) ancestors.pop_back();
        else break;
      }
      if (accept(node, cbg, rbg, bhg)) {
        glist.push_back(nodei);
        gflag[nodei] = 1;
        // mark the ancestor spine (stop at an already-marked ancestor —
        // its own ancestors are marked by induction)
        for (auto it = ancestors.rbegin(); it != ancestors.rend(); ++it) {
          if (aflag[*it]) break;
          aflag[*it] = 1;
          marked.push_back(*it);
        }
        nodei = node.next_branch;
      } else if (node.first_child < 0) {
        nodei = node.next_branch;  // handled at leaf level
      } else {
        ancestors.push_back(nodei);
        nodei = node.first_child;
      }
    }

    for (long l = l0; l < l1; ++l) {
      const Node &leaf = t.nodes[t.leaf_node_ids[l]];
      double cbl[3], rbl, bhl;
      sphere_of(leaf.pstart, leaf.pstart + leaf.pcount, cbl, rbl, bhl);
      std::vector<int32_t> &nlist = t.gl_lnodes[l];
      std::vector<int32_t> &plist = t.gl_lleaf[l];
      nodei = 0;
      while (nodei >= 0) {
        const Node &node = t.nodes[nodei];
        if (gflag[nodei]) {  // subtree already counted at group level
          nodei = node.next_branch;
          continue;
        }
        if (!aflag[nodei] && accept(node, cbl, rbl, bhl)) {
          nlist.push_back(nodei);
          nodei = node.next_branch;
        } else if (node.first_child < 0) {
          if (node.pcount > 0) plist.push_back(t.leaf_seq[nodei]);
          nodei = node.next_branch;
        } else {
          nodei = node.first_child;
        }
      }
    }
    for (int32_t id : glist) gflag[id] = 0;
    for (int32_t id : marked) aflag[id] = 0;

    // union near list: tile fetched once per group, bit i set when member
    // leaf l0+i lists it (device masks contributions per 128-row band)
    {
      std::vector<std::pair<int32_t, int32_t>> merged;  // (seq, bits)
      for (long l = l0; l < l1; ++l)
        for (int32_t seq : t.gl_lleaf[l])
          merged.emplace_back(seq, 1 << (int)(l - l0));
      std::sort(merged.begin(), merged.end());
      std::vector<int32_t> &useq = t.gl_gnear[g];
      std::vector<int32_t> &ubits = t.gl_gnearbits[g];
      for (auto &pr : merged) {
        if (!useq.empty() && useq.back() == pr.first)
          ubits.back() |= pr.second;
        else {
          useq.push_back(pr.first);
          ubits.push_back(pr.second);
        }
      }
    }
  }
  });
  t.gl_group_leaves = group_leaves;
  t.gl_theta = theta;
}

void parallel_for_impl(long n, int threads,
                       const std::function<void(long, long)> &body) {
  if (threads <= 0)
    threads = (int)std::max(1u, std::thread::hardware_concurrency());
  threads = (int)std::min<long>(threads, std::max<long>(1, n));
  if (threads == 1 || n < 1024) {
    body(0, n);
    return;
  }
  std::vector<std::thread> pool;
  long chunk = (n + threads - 1) / threads;
  for (int ti = 0; ti < threads; ++ti) {
    long a = ti * chunk, b = std::min(n, a + chunk);
    if (a >= b) break;
    pool.emplace_back([&body, a, b]() { body(a, b); });
  }
  for (auto &th : pool) th.join();
}
}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// curve: DFS child enumeration order — 1 = Hilbert (spatially contiguous
// leaf sequence; the device-engine default), 0 = Z/Morton (legacy order)
void *pnx_tree_build(const double *pos, long n, const double *mass,
                     long leaf_capacity, int order, const double *soft,
                     int kernel, int curve) {
  if (n <= 0 || order < 0 || order > 5) return nullptr;
  init_index_pos();
  Tree *t = new Tree();
  t->n = n;
  t->order = order;
  t->kernel = kernel;
  t->has_soft = soft != nullptr;

  // bounding cube
  double lo[3] = {pos[0], pos[1], pos[2]};
  double hi[3] = {pos[0], pos[1], pos[2]};
  for (long i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pos[3 * i + d]);
      hi[d] = std::max(hi[d], pos[3 * i + d]);
    }
  double cx = 0.5 * (lo[0] + hi[0]);
  double cy = 0.5 * (lo[1] + hi[1]);
  double cz = 0.5 * (lo[2] + hi[2]);
  double half = 0.0;
  for (int d = 0; d < 3; ++d) half = std::max(half, 0.5 * (hi[d] - lo[d]));
  half = std::max(half * 1.0000001, 1e-12);

  std::vector<int64_t> idx(n);
  for (long i = 0; i < n; ++i) idx[i] = i;
  t->nodes.reserve((size_t)(2.5 * n / std::max<long>(1, leaf_capacity)) + 64);
  build_rec(*t, idx, pos, 0, n, cx, cy, cz, half, (int)leaf_capacity, 0,
            curve ? 0 : -1);
  set_links(*t);

  // reorder particle data
  t->px.resize(n);
  t->py.resize(n);
  t->pz.resize(n);
  t->pm.resize(n);
  t->ph.assign(n, 0.0);
  t->orig_index.resize(n);
  for (long i = 0; i < n; ++i) {
    int64_t j = idx[i];
    t->px[i] = pos[3 * j + 0];
    t->py[i] = pos[3 * j + 1];
    t->pz[i] = pos[3 * j + 2];
    t->pm[i] = mass ? mass[j] : 1.0;
    if (soft) t->ph[i] = soft[j];
    t->orig_index[i] = j;
  }
  build_payloads(*t);
  return t;
}

void pnx_tree_free(void *h) { delete (Tree *)h; }

long pnx_tree_n_nodes(void *h) { return (long)((Tree *)h)->nodes.size(); }

// targets: (m,3).  self_mode: 1 => targets are the tree particles in ORIGINAL
// order (skip self, use own softening); 0 => arbitrary points (no skip,
// target softening = target_soft[i] or 0).
void pnx_tree_potentials(void *h, const double *targets, long m,
                         int self_mode, const double *target_soft,
                         double theta, int threads, double *out) {
  Tree *t = (Tree *)h;
  double c = t->has_soft ? soft_sep_factor(t->kernel) : 0.0;
  // map original index -> softening for self mode
  parallel_for_impl(m, threads, [&](long a, long b) {
    for (long i = a; i < b; ++i) {
      TraversalCtx ctx;
      ctx.theta2 = theta * theta;
      ctx.soft_factor = c;
      ctx.skip = self_mode ? i : -1;
      ctx.target_h = target_soft ? target_soft[i] : 0.0;
      out[i] = potential_at(*t, targets[3 * i], targets[3 * i + 1],
                            targets[3 * i + 2], ctx);
    }
  });
}

void pnx_tree_accelerations(void *h, const double *targets, long m,
                            int self_mode, const double *target_soft,
                            double theta, int threads, double *out) {
  Tree *t = (Tree *)h;
  double c = t->has_soft ? soft_sep_factor(t->kernel) : 0.0;
  parallel_for_impl(m, threads, [&](long a, long b) {
    for (long i = a; i < b; ++i) {
      TraversalCtx ctx;
      ctx.theta2 = theta * theta;
      ctx.soft_factor = c;
      ctx.skip = self_mode ? i : -1;
      ctx.target_h = target_soft ? target_soft[i] : 0.0;
      acceleration_at(*t, targets[3 * i], targets[3 * i + 1],
                      targets[3 * i + 2], ctx, out + 3 * i);
    }
  });
}

// --- two-level (group) interaction lists ------------------------------------

long pnx_tree_build_group_lists(void *h, long group_leaves, double theta) {
  Tree *t = (Tree *)h;
  build_group_lists(*t, group_leaves, theta);
  return (long)t->gl_gnodes.size();
}

void pnx_tree_group_list_sizes(void *h, long *gnode_counts,
                               long *lnode_counts, long *lleaf_counts) {
  Tree *t = (Tree *)h;
  for (size_t g = 0; g < t->gl_gnodes.size(); ++g)
    gnode_counts[g] = (long)t->gl_gnodes[g].size();
  for (size_t l = 0; l < t->gl_lnodes.size(); ++l) {
    lnode_counts[l] = (long)t->gl_lnodes[l].size();
    lleaf_counts[l] = (long)t->gl_lleaf[l].size();
  }
}

void pnx_tree_group_near_sizes(void *h, long *gnear_counts) {
  Tree *t = (Tree *)h;
  for (size_t g = 0; g < t->gl_gnear.size(); ++g)
    gnear_counts[g] = (long)t->gl_gnear[g].size();
}

void pnx_tree_group_near_data(void *h, int32_t *seqs, int32_t *bits) {
  Tree *t = (Tree *)h;
  long o = 0;
  for (size_t g = 0; g < t->gl_gnear.size(); ++g) {
    std::memcpy(seqs + o, t->gl_gnear[g].data(),
                t->gl_gnear[g].size() * sizeof(int32_t));
    std::memcpy(bits + o, t->gl_gnearbits[g].data(),
                t->gl_gnearbits[g].size() * sizeof(int32_t));
    o += (long)t->gl_gnear[g].size();
  }
}

void pnx_tree_group_targets(void *h, int32_t *starts, int32_t *counts) {
  Tree *t = (Tree *)h;
  std::memcpy(starts, t->gl_gstart.data(),
              t->gl_gstart.size() * sizeof(int32_t));
  std::memcpy(counts, t->gl_gcount.data(),
              t->gl_gcount.size() * sizeof(int32_t));
}

void pnx_tree_group_list_data(void *h, int32_t *gnode_ids,
                              int32_t *lnode_ids, int32_t *lleaf_idx) {
  Tree *t = (Tree *)h;
  long a = 0, b = 0, c = 0;
  for (size_t g = 0; g < t->gl_gnodes.size(); ++g) {
    std::memcpy(gnode_ids + a, t->gl_gnodes[g].data(),
                t->gl_gnodes[g].size() * sizeof(int32_t));
    a += (long)t->gl_gnodes[g].size();
  }
  for (size_t l = 0; l < t->gl_lnodes.size(); ++l) {
    std::memcpy(lnode_ids + b, t->gl_lnodes[l].data(),
                t->gl_lnodes[l].size() * sizeof(int32_t));
    b += (long)t->gl_lnodes[l].size();
    std::memcpy(lleaf_idx + c, t->gl_lleaf[l].data(),
                t->gl_lleaf[l].size() * sizeof(int32_t));
    c += (long)t->gl_lleaf[l].size();
  }
}

// --- block interaction lists (accelerator handoff) -------------------------

long pnx_tree_build_block_lists(void *h, long block_size, double theta) {
  Tree *t = (Tree *)h;
  build_block_lists(*t, block_size, theta);
  return (long)t->bl_nodes.size();
}

void pnx_tree_block_list_sizes(void *h, long *node_counts,
                               long *leaf_counts) {
  Tree *t = (Tree *)h;
  for (size_t b = 0; b < t->bl_nodes.size(); ++b) {
    node_counts[b] = (long)t->bl_nodes[b].size();
    leaf_counts[b] = (long)t->bl_leaf_idx[b].size();
  }
}

// leaves: count + per-leaf particle ranges (tree order)
long pnx_tree_n_leaves(void *h) {
  return (long)((Tree *)h)->leaf_node_ids.size();
}

void pnx_tree_leaves(void *h, int32_t *starts, int32_t *counts) {
  Tree *t = (Tree *)h;
  for (size_t s = 0; s < t->leaf_node_ids.size(); ++s) {
    const Node &nd = t->nodes[t->leaf_node_ids[s]];
    starts[s] = nd.pstart;
    counts[s] = nd.pcount;
  }
}

// assign arbitrary query points to their containing (or nearest) leaf:
// descend by child-cube distance, skipping empty subtrees.  Serves the
// device-evaluated at-points path (reference capability: tree traversal
// to arbitrary targets, tree.rs:1284).
void pnx_tree_point_leaves(void *h, const double *pts, long m,
                           int32_t *out_seq) {
  Tree *t = (Tree *)h;
  ensure_leaf_numbering(*t);
  parallel_for_impl(m, 0, [&](long a, long b) {
    for (long i = a; i < b; ++i) {
      const double p[3] = {pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
      int32_t cur = 0;
      while (t->nodes[cur].first_child >= 0) {
        int32_t best = -1;
        double bestd = 1e300;
        int32_t end = t->nodes[cur].next_branch;
        for (int32_t c = t->nodes[cur].first_child; c >= 0 && c != end;
             c = t->nodes[c].next_branch) {
          const Node &cn = t->nodes[c];
          bool leaf = cn.first_child < 0;
          if (leaf ? cn.pcount <= 0 : cn.mass <= 0.0)
            continue;  // empty subtree can't anchor near-field lists
          double d = 0.0;
          for (int k = 0; k < 3; ++k) {
            double o = std::abs(p[k] - cn.center[k]) - cn.half;
            if (o > 0) d += o * o;
          }
          if (d < bestd) {
            bestd = d;
            best = c;
            if (d == 0.0) break;
          }
        }
        if (best < 0) break;
        cur = best;
      }
      int32_t s = t->leaf_seq[cur];
      out_seq[i] = s >= 0 ? s : 0;
    }
  });
}

// per-block target ranges (tree order): start index + count
void pnx_tree_block_targets(void *h, int32_t *starts, int32_t *counts) {
  Tree *t = (Tree *)h;
  std::memcpy(starts, t->bl_start.data(),
              t->bl_start.size() * sizeof(int32_t));
  std::memcpy(counts, t->bl_count.data(),
              t->bl_count.size() * sizeof(int32_t));
}

// concatenated data (caller allocates using the size sums)
void pnx_tree_block_list_data(void *h, int32_t *node_ids,
                              int32_t *leaf_idx) {
  Tree *t = (Tree *)h;
  long no = 0, lo = 0;
  for (size_t b = 0; b < t->bl_nodes.size(); ++b) {
    std::memcpy(node_ids + no, t->bl_nodes[b].data(),
                t->bl_nodes[b].size() * sizeof(int32_t));
    no += (long)t->bl_nodes[b].size();
    std::memcpy(leaf_idx + lo, t->bl_leaf_idx[b].data(),
                t->bl_leaf_idx[b].size() * sizeof(int32_t));
    lo += (long)t->bl_leaf_idx[b].size();
  }
}

// node payload export: com(3), mass, hmax per node (+moments separately)
void pnx_tree_node_data(void *h, double *com, double *mass, double *hmax) {
  Tree *t = (Tree *)h;
  for (size_t i = 0; i < t->nodes.size(); ++i) {
    com[3 * i] = t->nodes[i].com[0];
    com[3 * i + 1] = t->nodes[i].com[1];
    com[3 * i + 2] = t->nodes[i].com[2];
    mass[i] = t->nodes[i].mass;
    hmax[i] = t->nodes[i].hmax;
  }
}

void pnx_tree_moments(void *h, double *out) {
  Tree *t = (Tree *)h;
  std::memcpy(out, t->moments.data(), t->moments.size() * sizeof(double));
}

int pnx_tree_nmom(void *h) { return ((Tree *)h)->nmom; }

// pack (n_leaves+1, 8, cap) f32 leaf tiles straight from the tree-order
// SoA — row layout [x, y, z, mass, soft, orig, 1, 0]; padded lanes get
// (sentinel, 0, 0, -2); final row is the all-dummy leaf.  Replaces the
// numpy fancy-index packer (31 s at 10M on this host; this is a straight
// convert/stream pass, <1 s).
void pnx_tree_pack_leaf_tiles(void *h, const int64_t *lstarts,
                              const int64_t *lcounts, long n_leaves,
                              const double *sentinel, long cap, float *out) {
  Tree *t = (Tree *)h;
  const float sx = (float)sentinel[0], sy = (float)sentinel[1],
              sz = (float)sentinel[2];
  parallel_for_impl(n_leaves, 0, [&](long lo, long hi) {
    for (long l = lo; l < hi; ++l) {
      float *tile = out + l * 8 * cap;
      const long s = lstarts[l];
      const long c = std::min<long>(lcounts[l], cap);
      for (long j = 0; j < c; ++j) {
        tile[j] = (float)t->px[s + j];
        tile[cap + j] = (float)t->py[s + j];
        tile[2 * cap + j] = (float)t->pz[s + j];
        tile[3 * cap + j] = (float)t->pm[s + j];
        tile[4 * cap + j] = (float)t->ph[s + j];
        tile[5 * cap + j] = (float)t->orig_index[s + j];
      }
      for (long j = c; j < cap; ++j) {
        tile[j] = sx;
        tile[cap + j] = sy;
        tile[2 * cap + j] = sz;
        tile[3 * cap + j] = 0.0f;
        tile[4 * cap + j] = 0.0f;
        tile[5 * cap + j] = -2.0f;
      }
      for (long j = 0; j < cap; ++j) tile[6 * cap + j] = 1.0f;
      for (long j = 0; j < cap; ++j) tile[7 * cap + j] = 0.0f;
    }
  });
  // all-dummy leaf row: sentinel position, zero mass, orig -2
  float *tile = out + n_leaves * 8 * cap;
  for (long j = 0; j < cap; ++j) {
    tile[j] = sx;
    tile[cap + j] = sy;
    tile[2 * cap + j] = sz;
    tile[3 * cap + j] = 0.0f;
    tile[4 * cap + j] = 0.0f;
    tile[5 * cap + j] = -2.0f;
    tile[6 * cap + j] = 0.0f;
    tile[7 * cap + j] = 0.0f;
  }
}

// reordered particle data export (tree order) + original indices
void pnx_tree_particles(void *h, double *pos, double *mass, double *soft,
                        int64_t *orig) {
  Tree *t = (Tree *)h;
  for (long i = 0; i < t->n; ++i) {
    pos[3 * i] = t->px[i];
    pos[3 * i + 1] = t->py[i];
    pos[3 * i + 2] = t->pz[i];
    mass[i] = t->pm[i];
    soft[i] = t->ph[i];
    orig[i] = t->orig_index[i];
  }
}

// direct sums (CPU fallback parity with the reference's direct.rs)
void pnx_direct_potentials(const double *pos, long n, const double *mass,
                           const double *soft, int kernel,
                           const double *targets, long m, int self_mode,
                           const double *target_soft, int threads,
                           double *out) {
  parallel_for_impl(m, threads, [&](long a, long b) {
    for (long i = a; i < b; ++i) {
      double tx = targets[3 * i], ty = targets[3 * i + 1],
             tz = targets[3 * i + 2];
      double th = target_soft ? target_soft[i] : 0.0;
      double phi = 0.0;
      for (long j = 0; j < n; ++j) {
        if (self_mode && j == i) continue;
        double dx = pos[3 * j] - tx;
        double dy = pos[3 * j + 1] - ty;
        double dz = pos[3 * j + 2] - tz;
        double r = std::sqrt(dx * dx + dy * dy + dz * dz + R2_TINY);
        double h = soft ? (self_mode ? std::max(th, soft[j]) : soft[j]) : th;
        phi += (mass ? mass[j] : 1.0) *
               kernel_phi(h > 0 ? kernel : KERNEL_NONE, r, h);
      }
      out[i] = phi;
    }
  });
}

void pnx_direct_accelerations(const double *pos, long n, const double *mass,
                              const double *soft, int kernel,
                              const double *targets, long m, int self_mode,
                              const double *target_soft, int threads,
                              double *out) {
  parallel_for_impl(m, threads, [&](long a, long b) {
    for (long i = a; i < b; ++i) {
      double tx = targets[3 * i], ty = targets[3 * i + 1],
             tz = targets[3 * i + 2];
      double th = target_soft ? target_soft[i] : 0.0;
      double ax = 0, ay = 0, az = 0;
      for (long j = 0; j < n; ++j) {
        if (self_mode && j == i) continue;
        double dx = pos[3 * j] - tx;
        double dy = pos[3 * j + 1] - ty;
        double dz = pos[3 * j + 2] - tz;
        double r = std::sqrt(dx * dx + dy * dy + dz * dz + R2_TINY);
        double h = soft ? (self_mode ? std::max(th, soft[j]) : soft[j]) : th;
        double g = (mass ? mass[j] : 1.0) *
                   kernel_g(h > 0 ? kernel : KERNEL_NONE, r, h);
        ax += dx * g;
        ay += dy * g;
        az += dz * g;
      }
      out[3 * i] = ax;
      out[3 * i + 1] = ay;
      out[3 * i + 2] = az;
    }
  });
}

// Fused far-class payload gather: for each block i, gather the contiguous
// id run flat_ids[starts[i] : starts[i]+counts[i]] of (P,) payload rows
// straight into the TRANSPOSED (ns, P, w) class matrix, fill-row padded.
// Replaces three numpy passes (padded id matrix -> row gather ->
// moveaxis copy) with one: the separate passes were ~55 s of 10M prep.
void pnx_gather_payload_t(const float *payload, const int32_t *flat_ids,
                          const int64_t *starts, const int64_t *counts,
                          long ns, long w, long P, int64_t fill,
                          float *out) {
  parallel_for_impl(ns, 0, [&](long lo, long hi) {
    for (long i = lo; i < hi; ++i) {
      float *o = out + i * P * w;
      const int32_t *ids = flat_ids + starts[i];
      const long c = std::min<long>(counts[i], w);
      for (long j = 0; j < c; ++j) {
        const float *row = payload + (long)ids[j] * P;
        for (long p = 0; p < P; ++p) o[p * w + j] = row[p];
      }
      const float *frow = payload + fill * P;
      for (long p = 0; p < P; ++p)
        for (long j = c; j < w; ++j) o[p * w + j] = frow[p];
    }
  });
}

// Padded int32 class list matrix: for each block i, copy the contiguous
// id run flat[starts[i] : starts[i]+counts[i]] into row i of the (ns, w)
// matrix, fill-padded.  Row copies are memcpy-speed; the numpy
// lane/idx/where form this replaces built int64 index matrices in
// freshly-faulted pages (~50 s on the 10M group lists, vs ~1 s here).
void pnx_pad_lists_i32(const int32_t *flat, const int64_t *starts,
                       const int64_t *counts, long ns, long w,
                       int32_t fill, int32_t *out) {
  parallel_for_impl(ns, 0, [&](long lo, long hi) {
    for (long i = lo; i < hi; ++i) {
      int32_t *o = out + i * w;
      const long c = std::min<long>(counts[i], w);
      if (c > 0) std::memcpy(o, flat + starts[i], c * sizeof(int32_t));
      for (long j = c; j < w; ++j) o[j] = fill;
    }
  });
}

}  // extern "C"
