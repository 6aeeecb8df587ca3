#pragma once
#include <map>
#include <string>
#include <vector>

namespace gs {

struct NpyArray {
  std::vector<size_t> shape;
  size_t word_size = 4;
  std::vector<float> data;  // converted to float32
};

using NpzFile = std::map<std::string, NpyArray>;

// Loads an uncompressed npz (np.savez). Throws std::runtime_error on error.
NpzFile load_npz(const std::string& path);

}  // namespace gs
