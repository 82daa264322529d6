// Native graph-JSON parser for gcn_song_embeddings_tpu.
//
// The reference relies on Python's json module + DGL's C++ graph build
// (spotify_graph.py:28-63).  For dataset_large, graph.json is ~531 MB of
// {"edges": [{"from": "...", "to": "..."}, ...]}; parsing it with the Python
// json module allocates millions of dicts.  This scanner extracts the edge id
// pairs in a single pass and resolves them to int32 node indices against a
// caller-supplied id table, returning ready-to-use CSR-buildable arrays.
//
// C ABI only (consumed via ctypes from
// gcn_song_embeddings_tpu/native/jsongraph.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Parser {
  const char* p;
  const char* end;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }

  bool at(char c) {
    skip_ws();
    return p < end && *p == c;
  }

  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }

  // Parse a JSON string (assumes *p == '"'); appends decoded chars to out.
  bool parse_string(std::string* out) {
    skip_ws();
    if (p >= end || *p != '"') return false;
    ++p;
    out->clear();
    while (p < end) {
      char c = *p++;
      if (c == '"') return true;
      if (c == '\\' && p < end) {
        char e = *p++;
        switch (e) {
          case 'n': out->push_back('\n'); break;
          case 't': out->push_back('\t'); break;
          case 'r': out->push_back('\r'); break;
          case 'b': out->push_back('\b'); break;
          case 'f': out->push_back('\f'); break;
          case 'u': {
            // Keep the raw escape; node ids never contain \u escapes.
            out->append("\\u");
            for (int i = 0; i < 4 && p < end; ++i) out->push_back(*p++);
            break;
          }
          default: out->push_back(e); break;
        }
      } else {
        out->push_back(c);
      }
    }
    return false;
  }

  // Skip any JSON value (used for keys we do not care about).
  bool skip_value() {
    skip_ws();
    if (p >= end) return false;
    char c = *p;
    if (c == '"') {
      std::string tmp;
      return parse_string(&tmp);
    }
    if (c == '{' || c == '[') {
      char open = c, close = (c == '{') ? '}' : ']';
      int depth = 0;
      bool in_str = false;
      while (p < end) {
        char d = *p++;
        if (in_str) {
          if (d == '\\') {
            if (p < end) ++p;
          } else if (d == '"') {
            in_str = false;
          }
        } else if (d == '"') {
          in_str = true;
        } else if (d == open) {
          ++depth;
        } else if (d == close) {
          if (--depth == 0) return true;
        }
      }
      return false;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
    return true;
  }
};

struct EdgeBuffers {
  std::vector<int32_t> from;
  std::vector<int32_t> to;
  int64_t missing = 0;  // ids not present in the table
};

}  // namespace

extern "C" {

// Opaque id table: maps node-id string -> int32 index.
void* jg_table_new(const char** ids, int64_t n_ids) {
  auto* table = new std::unordered_map<std::string, int32_t>();
  table->reserve(static_cast<size_t>(n_ids) * 2);
  for (int64_t i = 0; i < n_ids; ++i) {
    (*table)[std::string(ids[i])] = static_cast<int32_t>(i);
  }
  return table;
}

void jg_table_free(void* table) {
  delete static_cast<std::unordered_map<std::string, int32_t>*>(table);
}

// Parse {"edges": [{"from": id, "to": id}, ...]} from `path`, resolving ids
// through `table`.  Returns an opaque EdgeBuffers* (or nullptr on error);
// query it with jg_edges_len / jg_edges_copy, free with jg_edges_free.
void* jg_parse_edges(const char* path, void* table_ptr) {
  auto* table =
      static_cast<std::unordered_map<std::string, int32_t>*>(table_ptr);
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(size));
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  // Find the "edges" key at the top level.
  Parser ps{buf.data(), buf.data() + buf.size()};
  if (!ps.consume('{')) return nullptr;
  std::string key, sval;
  auto* out = new EdgeBuffers();
  out->from.reserve(1 << 20);
  out->to.reserve(1 << 20);
  bool ok = false;
  while (true) {
    if (!ps.parse_string(&key)) break;
    if (!ps.consume(':')) break;
    if (key != "edges") {
      if (!ps.skip_value()) break;
      if (!ps.consume(',')) break;
      continue;
    }
    if (!ps.consume('[')) break;
    if (ps.consume(']')) {  // empty edge list
      ok = true;
      break;
    }
    std::string from_id, to_id;
    bool parse_fail = false;
    while (true) {
      if (!ps.consume('{')) { parse_fail = true; break; }
      from_id.clear();
      to_id.clear();
      bool have_from = false, have_to = false;
      while (true) {
        if (!ps.parse_string(&key)) { parse_fail = true; break; }
        if (!ps.consume(':')) { parse_fail = true; break; }
        if (key == "from") {
          if (!ps.parse_string(&from_id)) { parse_fail = true; break; }
          have_from = true;
        } else if (key == "to") {
          if (!ps.parse_string(&to_id)) { parse_fail = true; break; }
          have_to = true;
        } else {
          if (!ps.skip_value()) { parse_fail = true; break; }
        }
        if (ps.consume(',')) continue;
        if (ps.consume('}')) break;
        parse_fail = true;
        break;
      }
      if (parse_fail) break;
      if (have_from && have_to) {
        auto fi = table->find(from_id);
        auto ti = table->find(to_id);
        if (fi != table->end() && ti != table->end()) {
          out->from.push_back(fi->second);
          out->to.push_back(ti->second);
        } else {
          ++out->missing;
        }
      }
      if (ps.consume(',')) continue;
      if (ps.consume(']')) { ok = true; }
      break;
    }
    break;
  }
  if (!ok) {
    delete out;
    return nullptr;
  }
  return out;
}

int64_t jg_edges_len(void* edges_ptr) {
  return static_cast<int64_t>(static_cast<EdgeBuffers*>(edges_ptr)->from.size());
}

int64_t jg_edges_missing(void* edges_ptr) {
  return static_cast<EdgeBuffers*>(edges_ptr)->missing;
}

void jg_edges_copy(void* edges_ptr, int32_t* out_from, int32_t* out_to) {
  auto* e = static_cast<EdgeBuffers*>(edges_ptr);
  std::memcpy(out_from, e->from.data(), e->from.size() * sizeof(int32_t));
  std::memcpy(out_to, e->to.data(), e->to.size() * sizeof(int32_t));
}

void jg_edges_free(void* edges_ptr) {
  delete static_cast<EdgeBuffers*>(edges_ptr);
}

}  // extern "C"
