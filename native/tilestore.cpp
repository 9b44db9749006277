// tilestore: memory-mapped binary tensor store for the onet-tpu data path.
//
// The reference persists datasets as torch pickles (torch.save dicts of
// tensors) and reloads them through the Python pickle machinery on every
// run. This native store gives the framework a production IO path:
//
//   * a flat, versioned binary layout (header + raw little-endian data),
//   * O(1) open via mmap (no deserialization; the OS pages data in as the
//     device transfer consumes it),
//   * multi-tensor archives addressed by name,
//   * checksummed headers so truncated writes are detected.
//
// Exposed as a tiny C ABI consumed from Python via ctypes/cffi
// (onet_tpu/data/tilestore.py). No external dependencies.

#include <cerrno>
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

constexpr uint64_t kMagic = 0x4f4e45545453544full;  // "ONETTSTO"
constexpr uint32_t kVersion = 1;
constexpr int kMaxDims = 8;
constexpr int kMaxName = 64;

#pragma pack(push, 1)
struct EntryHeader {
  char name[kMaxName];
  uint32_t dtype;  // 0=f32, 1=u16, 2=i32, 3=u8, 4=i64, 5=bf16 (ids opaque here)
  uint32_t ndim;
  int64_t shape[kMaxDims];
  uint64_t byte_size;
  uint64_t data_offset;  // absolute offset in file
};

struct FileHeader {
  uint64_t magic;
  uint32_t version;
  uint32_t n_entries;
  uint64_t checksum;  // FNV-1a over all entry headers
};
#pragma pack(pop)

uint64_t fnv1a(const uint8_t* p, size_t n, uint64_t h = 1469598103934665603ull) {
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

struct OpenStore {
  uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<EntryHeader> entries;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// writer
// ---------------------------------------------------------------------------

struct TsWriter {
  FILE* f = nullptr;
  std::vector<EntryHeader> entries;
  std::string path;
};

TsWriter* ts_writer_open(const char* path) {
  auto* w = new TsWriter();
  w->path = path;
  w->f = std::fopen(path, "wb");
  if (!w->f) {
    delete w;
    return nullptr;
  }
  return w;
}

// Reserve space: header written at close time once entry count is known.
int ts_writer_add(TsWriter* w, const char* name, uint32_t dtype,
                  const int64_t* shape, uint32_t ndim, const void* data,
                  uint64_t byte_size) {
  if (!w || !w->f || ndim > kMaxDims) return -1;
  EntryHeader e;
  std::memset(&e, 0, sizeof(e));
  std::snprintf(e.name, kMaxName, "%s", name);
  e.dtype = dtype;
  e.ndim = ndim;
  for (uint32_t i = 0; i < ndim; ++i) e.shape[i] = shape[i];
  e.byte_size = byte_size;
  e.data_offset = 0;  // fixed up at close
  w->entries.push_back(e);
  // stage data in a temp section right away (sequential write)
  long pos = std::ftell(w->f);
  w->entries.back().data_offset = static_cast<uint64_t>(pos);
  if (std::fwrite(data, 1, byte_size, w->f) != byte_size) return -2;
  return 0;
}

int ts_writer_close(TsWriter* w) {
  if (!w) return -1;
  int rc = 0;
  if (w->f) {
    // append the entry table + file header at the END (data was streamed
    // first), then write a trailer pointing at the table.
    long table_pos = std::ftell(w->f);
    // data offsets were recorded relative to a file that starts with data;
    // shift everything by 0 (data already absolute from file start).
    for (auto& e : w->entries) {
      if (std::fwrite(&e, 1, sizeof(e), w->f) != sizeof(e)) rc = -2;
    }
    FileHeader h;
    h.magic = kMagic;
    h.version = kVersion;
    h.n_entries = static_cast<uint32_t>(w->entries.size());
    h.checksum = fnv1a(reinterpret_cast<const uint8_t*>(w->entries.data()),
                       w->entries.size() * sizeof(EntryHeader));
    uint64_t tp = static_cast<uint64_t>(table_pos);
    if (std::fwrite(&tp, 1, sizeof(tp), w->f) != sizeof(tp)) rc = -2;
    if (std::fwrite(&h, 1, sizeof(h), w->f) != sizeof(h)) rc = -2;
    std::fclose(w->f);
  }
  delete w;
  return rc;
}

// ---------------------------------------------------------------------------
// reader
// ---------------------------------------------------------------------------

OpenStore* ts_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (long)(sizeof(FileHeader) + 8)) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (base == MAP_FAILED) return nullptr;

  auto* s = new OpenStore();
  s->base = static_cast<uint8_t*>(base);
  s->size = st.st_size;

  const uint8_t* tail = s->base + s->size - sizeof(FileHeader) - 8;
  uint64_t table_pos;
  std::memcpy(&table_pos, tail, 8);
  FileHeader h;
  std::memcpy(&h, tail + 8, sizeof(h));
  if (h.magic != kMagic || h.version != kVersion ||
      table_pos + h.n_entries * sizeof(EntryHeader) > s->size) {
    munmap(s->base, s->size);
    delete s;
    return nullptr;
  }
  s->entries.resize(h.n_entries);
  std::memcpy(s->entries.data(), s->base + table_pos,
              h.n_entries * sizeof(EntryHeader));
  uint64_t sum = fnv1a(reinterpret_cast<const uint8_t*>(s->entries.data()),
                       h.n_entries * sizeof(EntryHeader));
  if (sum != h.checksum) {
    munmap(s->base, s->size);
    delete s;
    return nullptr;
  }
  return s;
}

int ts_num_entries(OpenStore* s) { return s ? (int)s->entries.size() : -1; }

// Fills caller buffers; returns data pointer into the mapping (zero copy).
const void* ts_entry(OpenStore* s, int idx, char* name_out, uint32_t* dtype,
                     int64_t* shape_out, uint32_t* ndim,
                     uint64_t* byte_size) {
  if (!s || idx < 0 || idx >= (int)s->entries.size()) return nullptr;
  const EntryHeader& e = s->entries[idx];
  std::snprintf(name_out, kMaxName, "%s", e.name);
  *dtype = e.dtype;
  *ndim = e.ndim;
  for (uint32_t i = 0; i < e.ndim; ++i) shape_out[i] = e.shape[i];
  *byte_size = e.byte_size;
  if (e.data_offset + e.byte_size > s->size) return nullptr;
  return s->base + e.data_offset;
}

void ts_close(OpenStore* s) {
  if (!s) return;
  if (s->base) munmap(s->base, s->size);
  delete s;
}

}  // extern "C"
