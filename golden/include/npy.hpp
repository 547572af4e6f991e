// Minimal libnpy-compatible npy reader/writer, written from the public
// NumPy .npy format spec (v1.0) for building the reference host drivers.
// The reference's util.hpp (common/include/util.hpp:37-58) calls
//   npy::SaveArrayAsNumpy(filename, fortran_order, n_dims, shape_ptr, vec)
//   npy::LoadArrayFromNumpy(filename, shape, fortran_order, data)
// with uint64 shapes; this header provides exactly that surface.
#ifndef GOLDEN_NPY_SHIM_HPP
#define GOLDEN_NPY_SHIM_HPP

#include <complex>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace npy {

template <typename T> struct dtype_descr;
template <> struct dtype_descr<float> {
  static const char *value() { return "<f4"; }
};
template <> struct dtype_descr<double> {
  static const char *value() { return "<f8"; }
};
template <> struct dtype_descr<std::complex<float>> {
  static const char *value() { return "<c8"; }
};
template <> struct dtype_descr<std::complex<double>> {
  static const char *value() { return "<c16"; }
};
template <> struct dtype_descr<std::int32_t> {
  static const char *value() { return "<i4"; }
};
template <> struct dtype_descr<std::uint32_t> {
  static const char *value() { return "<u4"; }
};
template <> struct dtype_descr<std::int64_t> {
  static const char *value() { return "<i8"; }
};
template <> struct dtype_descr<std::uint64_t> {
  static const char *value() { return "<u8"; }
};

static const char MAGIC[7] = "\x93NUMPY";

template <typename Scalar>
inline void SaveArrayAsNumpy(const std::string &filename, bool fortran_order,
                             std::size_t n_dims, const std::uint64_t *shape,
                             const std::vector<Scalar> &data) {
  std::ostringstream dict;
  dict << "{'descr': '" << dtype_descr<Scalar>::value()
       << "', 'fortran_order': " << (fortran_order ? "True" : "False")
       << ", 'shape': (";
  for (std::size_t i = 0; i < n_dims; ++i) {
    dict << shape[i];
    if (n_dims == 1 || i + 1 < n_dims)
      dict << (n_dims == 1 ? "," : (i + 1 < n_dims ? ", " : ""));
  }
  dict << "), }";
  std::string header = dict.str();
  // pad with spaces so that magic(6)+ver(2)+hlen(2)+header is 64-aligned,
  // terminated by '\n'
  std::size_t unpadded = 10 + header.size() + 1;
  std::size_t padded = ((unpadded + 63) / 64) * 64;
  header.append(padded - unpadded, ' ');
  header.push_back('\n');

  std::ofstream f(filename, std::ios::binary);
  if (!f)
    throw std::runtime_error("npy: cannot open for write: " + filename);
  f.write(MAGIC, 6);
  const char ver[2] = {1, 0};
  f.write(ver, 2);
  std::uint16_t hlen = static_cast<std::uint16_t>(header.size());
  f.write(reinterpret_cast<const char *>(&hlen), 2);
  f.write(header.data(), header.size());
  f.write(reinterpret_cast<const char *>(data.data()),
          static_cast<std::streamsize>(data.size() * sizeof(Scalar)));
}

namespace detail {
inline std::string parse_field(const std::string &dict, const std::string &key) {
  std::size_t p = dict.find("'" + key + "'");
  if (p == std::string::npos)
    throw std::runtime_error("npy: header missing key " + key);
  p = dict.find(':', p);
  return dict.substr(p + 1);
}
} // namespace detail

template <typename Scalar>
inline void LoadArrayFromNumpy(const std::string &filename,
                               std::vector<std::uint64_t> &shape,
                               bool &fortran_order, std::vector<Scalar> &data) {
  std::ifstream f(filename, std::ios::binary);
  if (!f)
    throw std::runtime_error("npy: cannot open for read: " + filename);
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, MAGIC, 6) != 0)
    throw std::runtime_error("npy: bad magic in " + filename);
  unsigned char ver[2];
  f.read(reinterpret_cast<char *>(ver), 2);
  std::uint32_t hlen = 0;
  if (ver[0] == 1) {
    std::uint16_t h16;
    f.read(reinterpret_cast<char *>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char *>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);

  // descr check
  std::string descr = detail::parse_field(header, "descr");
  std::size_t q0 = descr.find('\'');
  std::size_t q1 = descr.find('\'', q0 + 1);
  std::string dt = descr.substr(q0 + 1, q1 - q0 - 1);
  if (dt != dtype_descr<Scalar>::value())
    throw std::runtime_error("npy: dtype mismatch in " + filename + ": file " +
                             dt + " vs requested " +
                             dtype_descr<Scalar>::value());

  std::string fo = detail::parse_field(header, "fortran_order");
  fortran_order = fo.find("True") != std::string::npos &&
                  fo.find("True") < fo.find(',');

  std::string sh = detail::parse_field(header, "shape");
  std::size_t lp = sh.find('('), rp = sh.find(')');
  std::string inner = sh.substr(lp + 1, rp - lp - 1);
  shape.clear();
  std::stringstream ss(inner);
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    // strip spaces
    std::size_t a = tok.find_first_not_of(" \t");
    if (a == std::string::npos)
      continue;
    shape.push_back(std::stoull(tok.substr(a)));
  }

  std::uint64_t count = 1;
  for (auto d : shape)
    count *= d;
  data.resize(count);
  f.read(reinterpret_cast<char *>(data.data()),
         static_cast<std::streamsize>(count * sizeof(Scalar)));
  if (!f)
    throw std::runtime_error("npy: truncated data in " + filename);
}

} // namespace npy

#endif
