// ctar: native tar shard reader for the input pipeline.
//
// The reference data plane burns host CPU in Python (webdataset tar parsing
// inside DataLoader worker processes, training/data_wds.py). On a TPU host
// feeding >3k img/s, header parsing + member extraction is pure overhead;
// this library scans a POSIX ustar/GNU tar once into an in-memory index and
// serves member reads via pread(2), so Python only touches the bytes that
// matter (JPEG payloads). Thread-safe for concurrent reads on one handle.
//
// C ABI (ctypes-friendly):
//   void*  ctar_open(const char* path)
//   long   ctar_count(void* h)
//   int    ctar_entry(void* h, long i, char* name_out, int name_cap,
//                     long* offset_out, long* size_out)
//   long   ctar_read(void* h, long offset, long size, unsigned char* out)
//   void   ctar_close(void* h)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct Entry {
  std::string name;
  int64_t offset;  // payload offset in file
  int64_t size;    // payload size
};

struct Handle {
  int fd = -1;
  std::vector<Entry> entries;
};

constexpr int64_t kBlock = 512;

int64_t parse_octal(const char* p, size_t n) {
  // GNU tar base-256 extension for sizes >= 8GB.
  if (n > 0 && (static_cast<unsigned char>(p[0]) & 0x80)) {
    int64_t v = static_cast<unsigned char>(p[0]) & 0x7f;
    for (size_t i = 1; i < n; ++i) {
      v = (v << 8) | static_cast<unsigned char>(p[i]);
    }
    return v;
  }
  int64_t v = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] == ' ') continue;
    if (p[i] < '0' || p[i] > '7') break;
    v = v * 8 + (p[i] - '0');
  }
  return v;
}

bool is_zero_block(const char* b) {
  for (int i = 0; i < kBlock; ++i)
    if (b[i] != 0) return false;
  return true;
}

}  // namespace

extern "C" {

void* ctar_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;

  auto* h = new Handle();
  h->fd = fd;

  char block[kBlock];
  int64_t pos = 0;
  int zero_blocks = 0;
  std::string pending_longname;

  while (true) {
    ssize_t got = ::pread(fd, block, kBlock, pos);
    if (got < kBlock) break;
    if (is_zero_block(block)) {
      if (++zero_blocks >= 2) break;
      pos += kBlock;
      continue;
    }
    zero_blocks = 0;

    char typeflag = block[156];
    int64_t size = parse_octal(block + 124, 12);
    int64_t payload = pos + kBlock;
    int64_t padded = ((size + kBlock - 1) / kBlock) * kBlock;

    if (typeflag == 'L') {
      // GNU long name: payload holds the real name of the next entry.
      std::string name(size, '\0');
      if (::pread(fd, name.data(), size, payload) == size) {
        while (!name.empty() && name.back() == '\0') name.pop_back();
        pending_longname = std::move(name);
      }
    } else if (typeflag == 'x') {
      // PAX extended header: records of the form "<len> key=value\n".
      std::string pax(size, '\0');
      if (::pread(fd, pax.data(), size, payload) == size) {
        size_t p = 0;
        while (p < pax.size()) {
          size_t sp = pax.find(' ', p);
          if (sp == std::string::npos) break;
          long rec_len = std::strtol(pax.c_str() + p, nullptr, 10);
          if (rec_len <= 0) break;
          size_t rec_end = p + static_cast<size_t>(rec_len);
          size_t eq = pax.find('=', sp);
          if (eq != std::string::npos && rec_end <= pax.size() + 1) {
            std::string key = pax.substr(sp + 1, eq - sp - 1);
            // value runs to the trailing '\n' of the record
            std::string value = pax.substr(eq + 1, rec_end - eq - 2);
            if (key == "path") pending_longname = value;
          }
          p = rec_end;
        }
      }
    } else if (typeflag == '0' || typeflag == '\0') {
      std::string name;
      if (!pending_longname.empty()) {
        name = std::move(pending_longname);
        pending_longname.clear();
      } else {
        char prefix[156] = {0};
        std::memcpy(prefix, block + 345, 155);
        char shortname[101] = {0};
        std::memcpy(shortname, block, 100);
        name = prefix[0] ? std::string(prefix) + "/" + shortname : shortname;
      }
      h->entries.push_back(Entry{std::move(name), payload, size});
    } else {
      pending_longname.clear();
    }
    pos = payload + padded;
  }
  return h;
}

long ctar_count(void* hp) {
  return hp ? static_cast<long>(static_cast<Handle*>(hp)->entries.size()) : -1;
}

int ctar_entry(void* hp, long i, char* name_out, int name_cap,
               long* offset_out, long* size_out) {
  if (!hp) return -1;
  auto* h = static_cast<Handle*>(hp);
  if (i < 0 || i >= static_cast<long>(h->entries.size())) return -1;
  const Entry& e = h->entries[i];
  std::snprintf(name_out, name_cap, "%s", e.name.c_str());
  *offset_out = e.offset;
  *size_out = e.size;
  return 0;
}

long ctar_read(void* hp, long offset, long size, unsigned char* out) {
  if (!hp) return -1;
  auto* h = static_cast<Handle*>(hp);
  int64_t done = 0;
  while (done < size) {
    ssize_t got = ::pread(h->fd, out + done, size - done, offset + done);
    if (got <= 0) return done;
    done += got;
  }
  return done;
}

void ctar_close(void* hp) {
  if (!hp) return;
  auto* h = static_cast<Handle*>(hp);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
