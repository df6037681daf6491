// oa_jsonl_filter — streaming OpenAlex "works" JSONL ingest filter.
//
// TPU-framework equivalent of the reference repo's native ingest stage
// (behavioral contract from /root/reference/oa_jsonl.c:351-414 — studied,
// not copied; this is a fresh design):
//
//   stdin:  OpenAlex works JSONL (one JSON object per line)
//   stdout: {"id":"...","document":"<title> <abstract>"} JSONL
//
// Per record:
//   * keep only: id, title, language, abstract_inverted_index
//   * drop records whose `language` field is present and not "en"
//     (records with NO language field are kept, matching the reference)
//   * drop records with a null/absent/empty abstract_inverted_index
//   * reconstruct the abstract from OpenAlex's inverted index
//     (word -> [token positions]): place each word at its positions
//     (later duplicates win), join non-empty slots with single spaces
//   * document = "<title> <abstract>", or just the abstract when title
//     is null
//
// Design differences from the reference implementation (improvements,
// documented for the parity record):
//   * forward escape-state string scanner (not backward backslash-parity)
//   * malformed lines are skipped with a capped stderr warning instead of
//     abort()  (the reference asserts and kills the whole pipeline)
//   * negative/absurd token positions are ignored instead of writing out
//     of bounds
//
// String contents pass through in raw (still-JSON-escaped) form, so the
// output is valid JSON without an unescape/re-escape round trip. UTF-16
// surrogate escapes are passed through unchanged (same observable
// behavior as the reference, oa_jsonl.c:401).
//
// Build: g++ -O2 -std=c++17 -o oa_jsonl_filter oa_jsonl_filter.cc

#include <cstdio>
#include <cstring>
#include <string>
#include <string_view>
#include <vector>

namespace {

constexpr size_t kMaxPositions = 1 << 20;  // ignore token positions beyond this
constexpr int kMaxWarnings = 20;

struct Parser {
  const char* p;
  const char* end;

  explicit Parser(std::string_view line) : p(line.data()), end(line.data() + line.size()) {}

  bool eof() const { return p >= end; }

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
  }

  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }

  char peek() {
    skip_ws();
    return p < end ? *p : '\0';
  }

  // Scan a JSON string (cursor at opening quote); returns the raw
  // contents between the quotes (escapes left intact).
  bool scan_string(std::string_view* out) {
    skip_ws();
    if (p >= end || *p != '"') return false;
    const char* start = ++p;
    bool escaped = false;
    while (p < end) {
      if (escaped) {
        escaped = false;
      } else if (*p == '\\') {
        escaped = true;
      } else if (*p == '"') {
        if (out) *out = std::string_view(start, p - start);
        ++p;
        return true;
      }
      ++p;
    }
    return false;  // unterminated
  }

  bool scan_literal(const char* lit) {
    size_t n = std::strlen(lit);
    if (static_cast<size_t>(end - p) < n || std::memcmp(p, lit, n) != 0) return false;
    p += n;
    return true;
  }

  bool scan_number(long* out) {
    skip_ws();
    const char* start = p;
    if (p < end && (*p == '-' || *p == '+')) ++p;
    while (p < end && ((*p >= '0' && *p <= '9') || *p == '.' || *p == 'e' || *p == 'E' ||
                       *p == '+' || *p == '-'))
      ++p;
    if (p == start) return false;
    if (out) *out = std::strtol(start, nullptr, 10);
    return true;
  }

  // Skip any JSON value. Iterative for containers; strings handled with
  // the escape-aware scanner so braces inside strings don't count.
  bool skip_value() {
    skip_ws();
    if (p >= end) return false;
    switch (*p) {
      case '"':
        return scan_string(nullptr);
      case 't':
        return scan_literal("true");
      case 'f':
        return scan_literal("false");
      case 'n':
        return scan_literal("null");
      case '{':
      case '[': {
        int depth = 0;
        while (p < end) {
          char c = *p;
          if (c == '"') {
            if (!scan_string(nullptr)) return false;
            continue;
          }
          if (c == '{' || c == '[') ++depth;
          if (c == '}' || c == ']') --depth;
          ++p;
          if (depth == 0) return true;
        }
        return false;
      }
      default:
        return scan_number(nullptr);
    }
  }
};

// Reconstructed-abstract builder: positions -> raw word views.
class AbstractBuilder {
 public:
  void reset() { slots_.clear(); }

  void place(long pos, std::string_view word) {
    if (pos < 0 || pos >= static_cast<long>(kMaxPositions)) return;
    if (slots_.size() <= static_cast<size_t>(pos)) slots_.resize(pos + 1);
    slots_[pos] = word;
  }

  // Join non-empty slots with single spaces into `out`.
  void build(std::string* out) const {
    out->clear();
    for (const auto& w : slots_) {
      if (w.empty()) continue;
      if (!out->empty()) out->push_back(' ');
      out->append(w.data(), w.size());
    }
  }

  bool empty() const { return slots_.empty(); }

 private:
  std::vector<std::string_view> slots_;
};

enum class RecordStatus { kEmit, kDrop, kMalformed };

// Parse one work record; fills id/title/abstract views on kEmit.
RecordStatus parse_record(std::string_view line, AbstractBuilder* builder,
                          std::string_view* id, std::string_view* title,
                          bool* has_title, std::string* abstract_out) {
  Parser ps(line);
  *has_title = false;
  *id = {};
  bool have_abstract = false;

  if (!ps.consume('{')) return RecordStatus::kMalformed;
  if (ps.peek() == '}') {
    ps.consume('}');
    return RecordStatus::kDrop;  // empty object: nothing to index
  }

  while (true) {
    std::string_view key;
    if (!ps.scan_string(&key)) return RecordStatus::kMalformed;
    if (!ps.consume(':')) return RecordStatus::kMalformed;

    if (key == "id") {
      if (!ps.scan_string(id)) return RecordStatus::kMalformed;
    } else if (key == "title") {
      if (ps.peek() == 'n') {
        if (!ps.scan_literal("null")) return RecordStatus::kMalformed;
      } else if (ps.scan_string(title)) {
        *has_title = true;
      } else {
        return RecordStatus::kMalformed;
      }
    } else if (key == "language") {
      std::string_view lang;
      if (ps.peek() == 'n') {
        if (!ps.scan_literal("null")) return RecordStatus::kMalformed;
        return RecordStatus::kDrop;  // null language: drop
      }
      if (!ps.scan_string(&lang)) return RecordStatus::kMalformed;
      if (lang != "en") return RecordStatus::kDrop;
    } else if (key == "abstract_inverted_index") {
      if (ps.peek() == 'n') {
        if (!ps.scan_literal("null")) return RecordStatus::kMalformed;
        return RecordStatus::kDrop;  // no abstract: drop
      }
      if (!ps.consume('{')) return RecordStatus::kMalformed;
      builder->reset();
      if (ps.peek() != '}') {
        while (true) {
          std::string_view word;
          if (!ps.scan_string(&word)) return RecordStatus::kMalformed;
          if (!ps.consume(':')) return RecordStatus::kMalformed;
          if (!ps.consume('[')) return RecordStatus::kMalformed;
          if (ps.peek() != ']') {
            while (true) {
              long pos;
              if (!ps.scan_number(&pos)) return RecordStatus::kMalformed;
              builder->place(pos, word);
              if (!ps.consume(',')) break;
            }
          }
          if (!ps.consume(']')) return RecordStatus::kMalformed;
          if (!ps.consume(',')) break;
        }
      }
      if (!ps.consume('}')) return RecordStatus::kMalformed;
      builder->build(abstract_out);
      if (abstract_out->empty()) return RecordStatus::kDrop;
      have_abstract = true;
    } else {
      if (!ps.skip_value()) return RecordStatus::kMalformed;
    }

    if (ps.consume(',')) continue;
    if (ps.consume('}')) break;
    return RecordStatus::kMalformed;
  }

  if (!have_abstract || id->empty()) return RecordStatus::kDrop;
  return RecordStatus::kEmit;
}

}  // namespace

int main() {
  std::string line;
  std::string abstract;
  AbstractBuilder builder;
  int warnings = 0;
  long lineno = 0;

  // Buffered line reader over stdin.
  constexpr size_t kBuf = 1 << 20;
  std::vector<char> buf(kBuf);
  line.reserve(1 << 16);

  while (std::fgets(buf.data(), kBuf, stdin) != nullptr) {
    line.append(buf.data());
    if (!line.empty() && line.back() != '\n' && !std::feof(stdin)) {
      continue;  // long line: keep accumulating
    }
    ++lineno;
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r')) line.pop_back();
    if (!line.empty()) {
      std::string_view id, title;
      bool has_title = false;
      RecordStatus st = parse_record(line, &builder, &id, &title, &has_title, &abstract);
      if (st == RecordStatus::kEmit) {
        if (has_title) {
          std::printf("{\"id\":\"%.*s\",\"document\":\"%.*s %s\"}\n",
                      static_cast<int>(id.size()), id.data(),
                      static_cast<int>(title.size()), title.data(), abstract.c_str());
        } else {
          std::printf("{\"id\":\"%.*s\",\"document\":\"%s\"}\n",
                      static_cast<int>(id.size()), id.data(), abstract.c_str());
        }
      } else if (st == RecordStatus::kMalformed && warnings < kMaxWarnings) {
        std::fprintf(stderr, "oa_jsonl_filter: skipping malformed line %ld\n", lineno);
        if (++warnings == kMaxWarnings) {
          std::fprintf(stderr, "oa_jsonl_filter: further warnings suppressed\n");
        }
      }
    }
    line.clear();
  }
  return 0;
}
