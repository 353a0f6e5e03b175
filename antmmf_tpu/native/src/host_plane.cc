// Native host data-plane for antmmf_tpu: the hot host-side loops that feed
// the TPU — WordPiece tokenization and LMDB reads — as a single C-ABI shared
// library loaded via ctypes (no pybind11 in this image).
//
// Reference parity: the reference leans on native dependencies for its host
// data plane (HF fast tokenizers / liblmdb C / decord C++ —
// /root/reference/antmmf/datasets/processors/text_processors.py:101,
// /root/reference/antmmf/datasets/database/video_database.py:289-335).  This
// file is the TPU build's equivalent: the algorithms mirror
// antmmf_tpu/utils/tokenization.py (BERT basic+wordpiece) and
// antmmf_tpu/utils/lmdb_lite.py (LMDB data-format reader) exactly, and both
// keep their pure-Python twins as always-available fallbacks.
//
// Unicode policy: character classification (whitespace/control/punct/CJK) and
// the lower+accent-strip mapping are supplied by the Python side as flat
// tables built from the host interpreter's unicodedata, so native and Python
// paths agree by construction. A codepoint whose lowering is context-
// sensitive or multi-char is marked COMPLEX; wp_encode returns -1 for any
// text containing one and the caller falls back to Python for that string.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// WordPiece tokenizer
// ---------------------------------------------------------------------------

enum UcFlags : uint8_t {
  UC_WHITESPACE = 1,
  UC_CONTROL = 2,
  UC_PUNCT = 4,
  UC_CJK = 8,
  UC_DROP = 16,
};

static const int32_t LOWER_REMOVE = -1;   // maps to nothing (combining mark)
static const int32_t LOWER_COMPLEX = -2;  // needs the Python path

static const int UNICODE_MAX = 0x110000;

struct VocabMap {
  // open-addressing hash map: token bytes -> id
  struct Slot {
    uint32_t off = 0;  // offset into blob (0 = empty; blob[0] is a sentinel)
    uint32_t len = 0;
    int32_t id = -1;
  };
  std::string blob;  // all token bytes, blob[0] = '\0' sentinel
  std::vector<Slot> slots;
  uint32_t mask = 0;

  static uint64_t hash(const char* s, size_t n) {
    uint64_t h = 1469598103934665603ull;  // FNV-1a
    for (size_t i = 0; i < n; ++i) {
      h ^= (uint8_t)s[i];
      h *= 1099511628211ull;
    }
    return h;
  }

  void reserve(size_t n_tokens, size_t bytes) {
    size_t want = 1;
    while (want < n_tokens * 2) want <<= 1;
    slots.assign(want, Slot());
    mask = (uint32_t)(want - 1);
    blob.clear();
    blob.reserve(bytes + 1);
    blob.push_back('\0');
  }

  void insert(const char* s, size_t n, int32_t id) {
    uint64_t h = hash(s, n);
    uint32_t i = (uint32_t)h & mask;
    while (slots[i].off != 0) {
      if (slots[i].len == n &&
          memcmp(blob.data() + slots[i].off, s, n) == 0) {
        slots[i].id = id;  // last occurrence wins (dict assignment order)
        return;
      }
      i = (i + 1) & mask;
    }
    slots[i].off = (uint32_t)blob.size();
    slots[i].len = (uint32_t)n;
    slots[i].id = id;
    blob.append(s, n);
  }

  int32_t find(const char* s, size_t n) const {
    uint64_t h = hash(s, n);
    uint32_t i = (uint32_t)h & mask;
    while (slots[i].off != 0) {
      if (slots[i].len == n &&
          memcmp(blob.data() + slots[i].off, s, n) == 0)
        return slots[i].id;
      i = (i + 1) & mask;
    }
    return -1;
  }
};

struct WpTok {
  VocabMap vocab;
  std::vector<uint8_t> flags;      // [UNICODE_MAX]
  std::vector<int32_t> lower_map;  // [UNICODE_MAX]
  int do_lower_case = 1;
  int max_chars_per_word = 100;
  int32_t unk_id = -1;
};

WpTok* wp_create(const char* vocab_buf, long vocab_len,
                 const uint8_t* uc_flags, const int32_t* lower_map,
                 int do_lower_case, int max_chars_per_word,
                 const char* unk_token) {
  WpTok* t = new WpTok();
  t->do_lower_case = do_lower_case;
  t->max_chars_per_word = max_chars_per_word;
  t->flags.assign(uc_flags, uc_flags + UNICODE_MAX);
  t->lower_map.assign(lower_map, lower_map + UNICODE_MAX);

  // vocab file contents: one token per line, id = line index (empty lines
  // keep their index but are not inserted — matches load_vocab skipping them
  // while enumerate() still advances)
  size_t n_tokens = 0;
  for (long i = 0; i < vocab_len; ++i)
    if (vocab_buf[i] == '\n') ++n_tokens;
  t->vocab.reserve(n_tokens + 1, (size_t)vocab_len);
  int32_t id = 0;
  long start = 0;
  for (long i = 0; i <= vocab_len; ++i) {
    if (i == vocab_len || vocab_buf[i] == '\n') {
      long end = i;
      if (end > start && vocab_buf[end - 1] == '\r') --end;  // tolerate CRLF
      if (end > start) t->vocab.insert(vocab_buf + start, end - start, id);
      start = i + 1;
      ++id;
    }
  }
  t->unk_id = t->vocab.find(unk_token, strlen(unk_token));
  if (t->unk_id < 0) {
    delete t;
    return nullptr;
  }
  return t;
}

void wp_free(WpTok* t) { delete t; }

// UTF-8 decode next codepoint; input guaranteed valid (comes from a Python
// str encode). Returns bytes consumed.
static inline int u8_next(const char* s, long n, int32_t* cp) {
  uint8_t c = (uint8_t)s[0];
  if (c < 0x80) {
    *cp = c;
    return 1;
  }
  if ((c >> 5) == 0x6 && n >= 2) {
    *cp = ((c & 0x1F) << 6) | ((uint8_t)s[1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && n >= 3) {
    *cp = ((c & 0x0F) << 12) | (((uint8_t)s[1] & 0x3F) << 6) |
          ((uint8_t)s[2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && n >= 4) {
    *cp = ((c & 0x07) << 18) | (((uint8_t)s[1] & 0x3F) << 12) |
          (((uint8_t)s[2] & 0x3F) << 6) | ((uint8_t)s[3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

static inline int u8_emit(int32_t cp, char* out) {
  if (cp < 0x80) {
    out[0] = (char)cp;
    return 1;
  }
  if (cp < 0x800) {
    out[0] = (char)(0xC0 | (cp >> 6));
    out[1] = (char)(0x80 | (cp & 0x3F));
    return 2;
  }
  if (cp < 0x10000) {
    out[0] = (char)(0xE0 | (cp >> 12));
    out[1] = (char)(0x80 | ((cp >> 6) & 0x3F));
    out[2] = (char)(0x80 | (cp & 0x3F));
    return 3;
  }
  out[0] = (char)(0xF0 | (cp >> 18));
  out[1] = (char)(0x80 | ((cp >> 12) & 0x3F));
  out[2] = (char)(0x80 | ((cp >> 6) & 0x3F));
  out[3] = (char)(0x80 | (cp & 0x3F));
  return 4;
}

// Greedy longest-match wordpiece over one word (codepoint boundaries),
// appending ids to out. Word given as codepoints; scratch holds UTF-8 bytes
// ("##" + candidate) for hash probing.
static void wordpiece_word(const WpTok* t, const std::vector<int32_t>& cps,
                           std::vector<int32_t>* out) {
  int n = (int)cps.size();
  if (n == 0) return;
  if (n > t->max_chars_per_word) {
    out->push_back(t->unk_id);
    return;
  }
  // byte offsets of each codepoint inside the utf8 buffer (prefixed "##")
  static thread_local std::string buf;
  static thread_local std::vector<int> boff;
  buf.assign("##");
  boff.assign(n + 1, 0);
  char tmp[4];
  for (int i = 0; i < n; ++i) {
    boff[i] = (int)buf.size();
    buf.append(tmp, u8_emit(cps[i], tmp));
  }
  boff[n] = (int)buf.size();

  static thread_local std::vector<int32_t> pieces;
  pieces.clear();
  int start = 0;
  while (start < n) {
    int32_t id = -1;
    int end = n;
    for (; end > start; --end) {
      const char* s;
      size_t len;
      if (start > 0) {
        // "##" immediately precedes buf[boff[start]] only when start's bytes
        // are contiguous after the prefix — build explicitly instead:
        static thread_local std::string cand;
        cand.assign("##");
        cand.append(buf, boff[start], boff[end] - boff[start]);
        s = cand.data();
        len = cand.size();
        id = t->vocab.find(s, len);
      } else {
        s = buf.data() + boff[start];
        len = (size_t)(boff[end] - boff[start]);
        id = t->vocab.find(s, len);
      }
      if (id >= 0) break;
    }
    if (id < 0) {
      out->push_back(t->unk_id);
      return;
    }
    pieces.push_back(id);
    start = end;
  }
  for (int32_t id : pieces) out->push_back(id);
}

// Tokenize text -> ids. Returns count written, -1 if the text needs the
// Python fallback (COMPLEX lowering), -2 if out buffer too small.
long wp_encode(WpTok* t, const char* text, long text_len, int32_t* out_ids,
               long max_out) {
  static thread_local std::vector<int32_t> cleaned;  // post _clean/_pad_cjk
  cleaned.clear();
  long i = 0;
  while (i < text_len) {
    int32_t cp;
    i += u8_next(text + i, text_len - i, &cp);
    uint8_t f = cp < UNICODE_MAX ? t->flags[cp] : 0;
    if (f & UC_DROP || f & UC_CONTROL) continue;
    if (f & UC_CJK) {
      cleaned.push_back(' ');
      cleaned.push_back(cp);
      cleaned.push_back(' ');
    } else if (f & UC_WHITESPACE) {
      cleaned.push_back(' ');
    } else {
      cleaned.push_back(cp);
    }
  }

  static thread_local std::vector<int32_t> ids;
  static thread_local std::vector<int32_t> word;  // post lower/strip
  static thread_local std::vector<int32_t> sub;   // post punct split
  ids.clear();
  size_t pos = 0, N = cleaned.size();
  while (pos < N) {
    while (pos < N && cleaned[pos] == ' ') ++pos;
    size_t w0 = pos;
    while (pos < N && cleaned[pos] != ' ') ++pos;
    if (pos == w0) continue;
    word.clear();
    for (size_t k = w0; k < pos; ++k) {
      int32_t cp = cleaned[k];
      if (t->do_lower_case) {
        int32_t m = cp < UNICODE_MAX ? t->lower_map[cp] : LOWER_COMPLEX;
        if (m == LOWER_COMPLEX) return -1;
        if (m == LOWER_REMOVE) continue;
        cp = m;
      }
      word.push_back(cp);
    }
    // split on punctuation: each punct char its own token
    sub.clear();
    for (int32_t cp : word) {
      bool punct = cp < UNICODE_MAX && (t->flags[cp] & UC_PUNCT);
      if (punct) {
        if (!sub.empty()) {
          wordpiece_word(t, sub, &ids);
          sub.clear();
        }
        static thread_local std::vector<int32_t> one;
        one.assign(1, cp);
        wordpiece_word(t, one, &ids);
      } else {
        sub.push_back(cp);
      }
    }
    if (!sub.empty()) wordpiece_word(t, sub, &ids);
  }
  if ((long)ids.size() > max_out) return -2;
  memcpy(out_ids, ids.data(), ids.size() * sizeof(int32_t));
  return (long)ids.size();
}

// ---------------------------------------------------------------------------
// LMDB reader (mmap, read-only, snapshot-at-open)
// Mirrors antmmf_tpu/utils/lmdb_lite.py LmdbLiteReader (symas mdb.c format:
// magic 0xBEEFC0DE, 4096-byte pages, P_BRANCH/P_LEAF/P_OVERFLOW/P_META).
// ---------------------------------------------------------------------------

static const uint32_t MDB_MAGIC = 0xBEEFC0DE;
static const uint32_t MDB_DATA_VERSION = 1;
static const int PAGE_SIZE = 4096;
static const uint16_t P_BRANCH = 0x01, P_LEAF = 0x02, P_META = 0x08;
static const uint16_t F_BIGDATA = 0x01;
static const uint64_t INVALID_PGNO = ~0ull;

struct MdbEnv {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  uint64_t root = INVALID_PGNO;
  uint64_t entries = 0;
};

static inline uint16_t rd16(const uint8_t* p) {
  uint16_t v;
  memcpy(&v, p, 2);
  return v;
}
static inline uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
static inline uint64_t rd64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;
}

MdbEnv* mdblite_open(const char* path) {
  std::string p(path);
  struct stat st;
  if (stat(p.c_str(), &st) == 0 && S_ISDIR(st.st_mode)) p += "/data.mdb";
  int fd = open(p.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  if (fstat(fd, &st) != 0 || st.st_size < 2 * PAGE_SIZE) {
    close(fd);
    return nullptr;
  }
  void* m = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (m == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  MdbEnv* env = new MdbEnv();
  env->fd = fd;
  env->map = (const uint8_t*)m;
  env->size = (size_t)st.st_size;

  // live meta = larger txnid of pages 0/1
  uint64_t best_txn = 0;
  bool found = false;
  for (int pg = 0; pg < 2; ++pg) {
    const uint8_t* raw = env->map + (size_t)pg * PAGE_SIZE;
    uint16_t flags = rd16(raw + 10);
    if (!(flags & P_META)) continue;
    if (rd32(raw + 16) != MDB_MAGIC) continue;
    if (rd32(raw + 20) != MDB_DATA_VERSION) continue;
    // meta head = 16b page hdr + {magic,version,address,mapsize} (24) then
    // db_free (48) then db_main (48): main at raw+16+24+48
    const uint8_t* db = raw + 16 + 24 + 48;
    uint64_t root = rd64(db + 40);
    uint64_t entries = rd64(db + 32);
    uint64_t txnid = rd64(db + 48 + 8);
    if (!found || txnid >= best_txn) {
      best_txn = txnid;
      env->root = root;
      env->entries = entries;
      found = true;
    }
  }
  if (!found) {
    munmap((void*)env->map, env->size);
    close(env->fd);
    delete env;
    return nullptr;
  }
  return env;
}

void mdblite_close(MdbEnv* env) {
  if (!env) return;
  munmap((void*)env->map, env->size);
  close(env->fd);
  delete env;
}

long mdblite_entries(MdbEnv* env) { return (long)env->entries; }

// returns 1 found, 0 not found, -1 corrupt. *out points INTO the mmap
// (overflow chains are contiguous pages, so big values are contiguous too).
int mdblite_get(MdbEnv* env, const char* key, long klen, const char** out,
                long* outlen) {
  if (env->root == INVALID_PGNO) return 0;
  uint64_t pgno = env->root;
  for (int depth = 0; depth < 64; ++depth) {
    if ((pgno + 1) * PAGE_SIZE > env->size) return -1;
    const uint8_t* raw = env->map + pgno * PAGE_SIZE;
    uint16_t flags = rd16(raw + 10);
    uint16_t lower = rd16(raw + 12);
    int n = (lower - 16) / 2;
    if (flags & P_LEAF) {
      for (int i = 0; i < n; ++i) {
        uint16_t off = rd16(raw + 16 + 2 * i);
        uint16_t lo = rd16(raw + off), hi = rd16(raw + off + 2);
        uint16_t nflags = rd16(raw + off + 4), ksize = rd16(raw + off + 6);
        if (ksize == klen && memcmp(raw + off + 8, key, klen) == 0) {
          uint32_t dsize = (uint32_t)lo | ((uint32_t)hi << 16);
          if (nflags & F_BIGDATA) {
            uint64_t ovf = rd64(raw + off + 8 + ksize);
            if ((ovf * PAGE_SIZE + 16 + dsize) > env->size) return -1;
            *out = (const char*)(env->map + ovf * PAGE_SIZE + 16);
          } else {
            *out = (const char*)(raw + off + 8 + ksize);
          }
          *outlen = (long)dsize;
          return 1;
        }
      }
      return 0;
    }
    if (!(flags & P_BRANCH)) return -1;
    // rightmost child whose key <= target (first node's key is implicit)
    uint64_t child = INVALID_PGNO;
    for (int i = 0; i < n; ++i) {
      uint16_t off = rd16(raw + 16 + 2 * i);
      uint16_t lo = rd16(raw + off), hi = rd16(raw + off + 2);
      uint16_t nflags = rd16(raw + off + 4), ksize = rd16(raw + off + 6);
      uint64_t p = (uint64_t)lo | ((uint64_t)hi << 16) |
                   ((uint64_t)nflags << 32);
      if (i == 0) {
        child = p;
        continue;
      }
      int cmp = memcmp(raw + off + 8, key,
                       ksize < klen ? ksize : (size_t)klen);
      if (cmp < 0 || (cmp == 0 && ksize <= klen))
        child = p;
      else
        break;
    }
    if (child == INVALID_PGNO) return -1;
    pgno = child;
  }
  return -1;
}

// Write all keys into buf as [u32 len][bytes]... Returns total bytes needed
// (call once with max=0 to size, then again), or -1 on corruption.
long mdblite_keys(MdbEnv* env, char* buf, long max) {
  if (env->root == INVALID_PGNO) return 0;
  long total = 0;
  std::vector<uint64_t> stack;
  stack.push_back(env->root);
  while (!stack.empty()) {
    uint64_t pgno = stack.back();
    stack.pop_back();
    if ((pgno + 1) * PAGE_SIZE > env->size) return -1;
    const uint8_t* raw = env->map + pgno * PAGE_SIZE;
    uint16_t flags = rd16(raw + 10);
    uint16_t lower = rd16(raw + 12);
    int n = (lower - 16) / 2;
    if (flags & P_LEAF) {
      for (int i = 0; i < n; ++i) {
        uint16_t off = rd16(raw + 16 + 2 * i);
        uint16_t ksize = rd16(raw + off + 6);
        if (total + 4 + ksize <= max && buf) {
          uint32_t k32 = ksize;
          memcpy(buf + total, &k32, 4);
          memcpy(buf + total + 4, raw + off + 8, ksize);
        }
        total += 4 + ksize;
      }
    } else if (flags & P_BRANCH) {
      // push reversed so leftmost pops first (sorted key order)
      std::vector<uint64_t> kids(n);
      for (int i = 0; i < n; ++i) {
        uint16_t off = rd16(raw + 16 + 2 * i);
        uint16_t lo = rd16(raw + off), hi = rd16(raw + off + 2);
        uint16_t nflags = rd16(raw + off + 4);
        kids[i] = (uint64_t)lo | ((uint64_t)hi << 16) |
                  ((uint64_t)nflags << 32);
      }
      for (int i = n - 1; i >= 0; --i) stack.push_back(kids[i]);
    } else {
      return -1;
    }
  }
  return total;
}

}  // extern "C"
