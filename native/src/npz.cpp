// Minimal NPZ (zip of .npy) reader for the native viewer — replaces the
// reference's cnpy dependency (model_viewer_main.cpp:91-151) with a small
// dependency-free implementation. Supports the subset numpy's np.savez
// emits: stored (uncompressed) entries, little-endian float32/float64
// arrays, C order, npy format versions 1.0/2.0.

#include "gs/npz.h"

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>

namespace gs {

namespace {

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

NpyArray parse_npy(const uint8_t* data, size_t size) {
  if (size < 10 || std::memcmp(data, "\x93NUMPY", 6) != 0)
    throw std::runtime_error("not an npy entry");
  const uint8_t major = data[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd_u16(data + 8);
    header_off = 10;
  } else {
    header_len = rd_u32(data + 8);
    header_off = 12;
  }
  std::string header(reinterpret_cast<const char*>(data + header_off),
                     header_len);

  auto find_value = [&](const std::string& key) -> std::string {
    const size_t k = header.find("'" + key + "'");
    if (k == std::string::npos)
      throw std::runtime_error("npy header missing key " + key);
    size_t c = header.find(':', k);
    size_t start = header.find_first_not_of(" ", c + 1);
    size_t end;
    if (header[start] == '\'') {
      end = header.find('\'', start + 1) + 1;
    } else if (header[start] == '(') {
      end = header.find(')', start) + 1;
    } else {
      end = header.find_first_of(",}", start);
    }
    return header.substr(start, end - start);
  };

  NpyArray arr;
  const std::string descr = find_value("descr");
  if (descr.find("<f4") != std::string::npos) {
    arr.word_size = 4;
  } else if (descr.find("<f8") != std::string::npos) {
    arr.word_size = 8;
  } else {
    throw std::runtime_error("unsupported npy dtype " + descr);
  }
  if (find_value("fortran_order").find("True") != std::string::npos)
    throw std::runtime_error("fortran order unsupported");

  std::string shape_s = find_value("shape");
  arr.shape.clear();
  std::stringstream ss(shape_s.substr(1, shape_s.size() - 2));
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    if (tok.find_first_of("0123456789") == std::string::npos) continue;
    arr.shape.push_back(std::stoul(tok));
  }

  size_t count = 1;
  for (size_t d : arr.shape) count *= d;
  const uint8_t* payload = data + header_off + header_len;
  const size_t bytes = count * arr.word_size;
  if (header_off + header_len + bytes > size)
    throw std::runtime_error("npy payload truncated");

  arr.data.resize(count);
  if (arr.word_size == 4) {
    const float* f = reinterpret_cast<const float*>(payload);
    for (size_t i = 0; i < count; ++i) arr.data[i] = f[i];
  } else {
    const double* f = reinterpret_cast<const double*>(payload);
    for (size_t i = 0; i < count; ++i) arr.data[i] = static_cast<float>(f[i]);
  }
  return arr;
}

}  // namespace

NpzFile load_npz(const std::string& path) {
  std::ifstream in(path, std::ios::binary);
  if (!in) throw std::runtime_error("cannot open " + path);
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(in)),
                           std::istreambuf_iterator<char>());

  // Locate the end-of-central-directory record (numpy streams entries, so
  // local headers may carry zero sizes — the central directory is
  // authoritative).
  if (buf.size() < 22) throw std::runtime_error("file too small for zip");
  size_t eocd = std::string::npos;
  const size_t scan_start = buf.size() >= 22 + 65535 ? buf.size() - 22 - 65535 : 0;
  for (size_t i = buf.size() - 22 + 1; i-- > scan_start;) {
    if (rd_u32(buf.data() + i) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd == std::string::npos)
    throw std::runtime_error("zip end-of-central-directory not found");
  const uint16_t n_entries = rd_u16(buf.data() + eocd + 10);
  size_t cd_off = rd_u32(buf.data() + eocd + 16);

  NpzFile out;
  for (uint16_t e = 0; e < n_entries; ++e) {
    if (cd_off + 46 > buf.size() ||
        rd_u32(buf.data() + cd_off) != 0x02014b50)
      throw std::runtime_error("bad central directory entry");
    const uint16_t method = rd_u16(buf.data() + cd_off + 10);
    const uint32_t comp_size = rd_u32(buf.data() + cd_off + 20);
    const uint16_t name_len = rd_u16(buf.data() + cd_off + 28);
    const uint16_t extra_len = rd_u16(buf.data() + cd_off + 30);
    const uint16_t comment_len = rd_u16(buf.data() + cd_off + 32);
    const uint32_t local_off = rd_u32(buf.data() + cd_off + 42);
    std::string name(reinterpret_cast<const char*>(buf.data() + cd_off + 46),
                     name_len);
    cd_off += 46 + name_len + extra_len + comment_len;

    if (method != 0)
      throw std::runtime_error(
          "npz entry " + name +
          " is compressed; use np.savez (uncompressed), not savez_compressed");

    // Resolve payload offset via the entry's local header.
    if (local_off + 30 > buf.size() ||
        rd_u32(buf.data() + local_off) != 0x04034b50)
      throw std::runtime_error("bad local header for " + name);
    const uint16_t l_name = rd_u16(buf.data() + local_off + 26);
    const uint16_t l_extra = rd_u16(buf.data() + local_off + 28);
    const size_t data_off = local_off + 30 + l_name + l_extra;
    if (data_off + comp_size > buf.size())
      throw std::runtime_error("zip entry truncated");

    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy") {
      out[name.substr(0, name.size() - 4)] =
          parse_npy(buf.data() + data_off, comp_size);
    }
  }
  if (out.empty()) throw std::runtime_error("no npy entries found in " + path);
  return out;
}

}  // namespace gs
