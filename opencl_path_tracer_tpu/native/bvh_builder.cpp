// Native median-split BVH builder (host runtime component).
//
// C++ twin of accel/median_tree.py (which re-implements the reference's
// recursive host builder, NodeOnHost::build at main.cpp:210-262, in the
// flat pointer format of accel/types.py). The Python recursion is
// O(T log T) with heavy interpreter overhead — this builder handles
// multi-million-triangle scenes at scene-load time. Iterative explicit
// stack, nth_element median partition on the longest axis, leaves
// padded to a fixed stride. Output layout identical to the Python
// builder: nodes (N, 8) float32 [lo3 hi3 a b], a<0 internal (left=-a,
// right=left+1), a>=0 leaf [a, a+count); reordered triangle index list
// with a padding mask.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Builder {
  const float* lo;   // (T, 3)
  const float* hi;
  const float* mid;
  int leaf_size;
  std::vector<float> nodes;       // 8 per node
  std::vector<int32_t> order;     // padded reordered indices
  std::vector<uint8_t> pad;
  std::vector<int32_t> idx;       // work buffer
  int max_depth = 0;
};

struct Task {
  int slot;
  int begin, end;  // range in b->idx
  int depth;
};

void fill_leaf(Builder* b, int slot, int begin, int end,
               const float* lo, const float* hi) {
  int start = (int)b->order.size();
  int k = end - begin;
  for (int i = begin; i < end; ++i) b->order.push_back(b->idx[i]);
  for (int i = k; i < b->leaf_size; ++i) b->order.push_back(0);
  for (int i = 0; i < k; ++i) b->pad.push_back(0);
  for (int i = k; i < b->leaf_size; ++i) b->pad.push_back(1);
  float* n = &b->nodes[slot * 8];
  std::memcpy(n, lo, 3 * sizeof(float));
  std::memcpy(n + 3, hi, 3 * sizeof(float));
  n[6] = (float)start;
  n[7] = (float)(start + k);
}

}  // namespace

extern "C" {

// tris_lo/hi/mid: (T, 3) float32. Outputs are written through the
// handle-getter API below (single-threaded builder object).
void* ptx_build_bvh(const float* tris_lo, const float* tris_hi,
                    const float* tris_mid, int t, int leaf_size) {
  Builder* b = new Builder();
  b->lo = tris_lo;
  b->hi = tris_hi;
  b->mid = tris_mid;
  b->leaf_size = leaf_size;
  b->idx.resize(t);
  for (int i = 0; i < t; ++i) b->idx[i] = i;
  b->nodes.resize(8, 0.0f);  // slot 0 = root
  b->order.reserve((size_t)t + t / leaf_size + 8);
  b->pad.reserve(b->order.capacity());

  std::vector<Task> stack;
  stack.push_back({0, 0, t, 0});
  while (!stack.empty()) {
    Task task = stack.back();
    stack.pop_back();
    if (task.depth > b->max_depth) b->max_depth = task.depth;

    float lo[3] = {3e38f, 3e38f, 3e38f};
    float hi[3] = {-3e38f, -3e38f, -3e38f};
    for (int i = task.begin; i < task.end; ++i) {
      const float* tl = &b->lo[b->idx[i] * 3];
      const float* th = &b->hi[b->idx[i] * 3];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], tl[a]);
        hi[a] = std::max(hi[a], th[a]);
      }
    }

    int count = task.end - task.begin;
    if (count <= b->leaf_size) {
      fill_leaf(b, task.slot, task.begin, task.end, lo, hi);
      continue;
    }

    int axis = 0;
    float best = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > best) {
        best = hi[a] - lo[a];
        axis = a;
      }
    int half = count / 2;
    const float* mid = b->mid;
    std::nth_element(
        b->idx.begin() + task.begin, b->idx.begin() + task.begin + half,
        b->idx.begin() + task.end,
        [mid, axis](int32_t x, int32_t y) {
          float a = mid[x * 3 + axis], bb = mid[y * 3 + axis];
          if (a != bb) return a < bb;
          return x < y;  // stable tiebreak
        });

    int left_slot = (int)(b->nodes.size() / 8);
    b->nodes.resize(b->nodes.size() + 16, 0.0f);
    float* n = &b->nodes[task.slot * 8];
    std::memcpy(n, lo, 3 * sizeof(float));
    std::memcpy(n + 3, hi, 3 * sizeof(float));
    n[6] = -(float)left_slot;
    n[7] = 0.0f;
    stack.push_back({left_slot + 1, task.begin + half, task.end,
                     task.depth + 1});
    stack.push_back({left_slot, task.begin, task.begin + half,
                     task.depth + 1});
  }
  return b;
}

void ptx_bvh_counts(void* h, int* num_nodes, int* padded_t, int* depth) {
  Builder* b = (Builder*)h;
  *num_nodes = (int)(b->nodes.size() / 8);
  *padded_t = (int)b->order.size();
  *depth = b->max_depth;
}

void ptx_bvh_data(void* h, float* nodes_out, int32_t* order_out,
                  uint8_t* pad_out) {
  Builder* b = (Builder*)h;
  std::memcpy(nodes_out, b->nodes.data(),
              b->nodes.size() * sizeof(float));
  std::memcpy(order_out, b->order.data(),
              b->order.size() * sizeof(int32_t));
  std::memcpy(pad_out, b->pad.data(), b->pad.size());
}

void ptx_bvh_free(void* h) { delete (Builder*)h; }

}  // extern "C"
