// Native host runtime: point-cloud voxelization (C, ctypes ABI).
//
// TPU-native replacement for the reference's external CPU voxelizer
// (spconv Point2VoxelCPU3d, wrapped at
// pcdet/datasets/processor/data_processor.py:16-61).  Semantics match
// q3d_tpu/ops/voxelizer.py::voxelize_np exactly (validated by
// tests/test_native_runtime.py): first-seen voxel order, first max_points
// points per voxel, [z,y,x] output coords, fixed-capacity outputs.
//
// Single pass over points with an open-addressing hash table keyed on the
// linearized grid coordinate — O(N) and allocation-free after setup, far
// faster than the python/numpy fallback for the 200k+ point clouds of the
// nuScenes 10-sweep pipeline.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// returns number of voxels written (<= max_voxels)
int voxelize(const float* points, int64_t n_points, int n_feat,
             const float* voxel_size, const float* pc_range,
             const int64_t* grid_size, int max_points, int max_voxels,
             float* out_voxels,    // (max_voxels, max_points, n_feat), zeroed
             int32_t* out_coords,  // (max_voxels, 3), filled with -1
             int32_t* out_num) {   // (max_voxels,), zeroed
  const int64_t gx = grid_size[0], gy = grid_size[1], gz = grid_size[2];
  const float vx = voxel_size[0], vy = voxel_size[1], vz = voxel_size[2];
  const float x0 = pc_range[0], y0 = pc_range[1], z0 = pc_range[2];

  // open-addressing hash table: key -> voxel slot
  size_t cap = 1;
  while ((int64_t)cap < 2 * (int64_t)max_voxels + 16) cap <<= 1;
  cap <<= 1;
  std::vector<int64_t> keys(cap, -1);
  std::vector<int32_t> slots(cap, -1);
  const size_t mask = cap - 1;

  int num_voxels = 0;
  for (int64_t i = 0; i < n_points; ++i) {
    const float* p = points + i * n_feat;
    int64_t cx = (int64_t)((p[0] - x0) / vx - ((p[0] - x0) < 0 ? 1 : 0));
    // floor semantics for potentially negative offsets:
    float fx = (p[0] - x0) / vx, fy = (p[1] - y0) / vy, fz = (p[2] - z0) / vz;
    cx = (int64_t)fx; if (fx < 0 && (float)cx != fx) cx -= 1;
    int64_t cy = (int64_t)fy; if (fy < 0 && (float)cy != fy) cy -= 1;
    int64_t cz = (int64_t)fz; if (fz < 0 && (float)cz != fz) cz -= 1;
    if (cx < 0 || cx >= gx || cy < 0 || cy >= gy || cz < 0 || cz >= gz)
      continue;
    int64_t key = (cz * gy + cy) * gx + cx;

    size_t h = ((uint64_t)key * 0x9E3779B97F4A7C15ull) & mask;
    int32_t slot = -1;
    while (true) {
      if (keys[h] == key) { slot = slots[h]; break; }
      if (keys[h] == -1) {
        if (num_voxels >= max_voxels) { slot = -2; break; }
        slot = num_voxels++;
        keys[h] = key;
        slots[h] = slot;
        out_coords[slot * 3 + 0] = (int32_t)cz;
        out_coords[slot * 3 + 1] = (int32_t)cy;
        out_coords[slot * 3 + 2] = (int32_t)cx;
        break;
      }
      h = (h + 1) & mask;
    }
    if (slot < 0) continue;
    int32_t c = out_num[slot];
    if (c < max_points) {
      std::memcpy(out_voxels + ((int64_t)slot * max_points + c) * n_feat, p,
                  sizeof(float) * n_feat);
      out_num[slot] = c + 1;
    }
  }
  return num_voxels;
}

// shuffle-free range mask: writes 0/1 per point for xy-range containment
void mask_points_by_range(const float* points, int64_t n_points, int n_feat,
                          const float* limit_range, uint8_t* out_mask) {
  for (int64_t i = 0; i < n_points; ++i) {
    const float* p = points + i * n_feat;
    out_mask[i] = (p[0] >= limit_range[0] && p[0] <= limit_range[3] &&
                   p[1] >= limit_range[1] && p[1] <= limit_range[4]) ? 1 : 0;
  }
}

}  // extern "C"
