// Native sequence-data loader for rails_tpu.
//
// The reference feeds training through pandas + Python `eval()` of
// stringified per-user lists (`/root/reference/data/dataset.py:63-125`) inside
// torch DataLoader worker processes. Here the two host-side hot loops are
// native:
//   1. parsing sasrec_format.csv into the flat ragged (offsets, values)
//      layout, and
//   2. assembling fixed-shape, zero-padded batches (truncate-to-last-N,
//      leave-one-out target split) ready for device transfer.
//
// Exposed as a plain C ABI consumed via ctypes (rails_tpu/data/native.py),
// with a pure-NumPy fallback when the shared library is absent.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

struct ParsedSequences {
  int64_t num_users;
  int64_t total_events;
  int32_t* user_ids;      // [num_users]
  int64_t* offsets;       // [num_users + 1]
  int32_t* item_ids;      // [total_events]
  int32_t* ratings;       // [total_events]
  int64_t* timestamps;    // [total_events]
  char* error;            // nullptr on success
  int64_t skipped_rows;   // malformed rows dropped (caller must surface)
};

namespace {

// Reads one bracketed numeric list "[a, b, c]" within [s, field_end).
// Values may carry a fractional part (ML-20M / Amazon ratings are floats,
// e.g. "4.0", "3.5"); it is truncated — exact for the integer-threshold
// comparisons downstream (floor(r) >= t  <=>  r >= t for integer t, r >= 0).
template <typename T>
bool parse_int_list(const char* s, const char* field_end, std::vector<T>* out) {
  while (s < field_end && *s != '[' && *s != '(') s++;
  if (s >= field_end) return false;
  s++;
  while (s < field_end && *s != ']' && *s != ')') {
    while (s < field_end && (*s == ' ' || *s == ',')) s++;
    if (s >= field_end || *s == ']' || *s == ')') break;
    char* end = nullptr;
    long long v = strtoll(s, &end, 10);
    if (end == s) return false;
    if (end < field_end && *end == '.') {  // skip the fractional digits
      end++;
      while (end < field_end && *end >= '0' && *end <= '9') end++;
    }
    out->push_back(static_cast<T>(v));
    s = end;
  }
  return true;
}

char* dup_error(const std::string& msg) {
  char* e = static_cast<char*>(malloc(msg.size() + 1));
  memcpy(e, msg.c_str(), msg.size() + 1);
  return e;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// CSV parsing.
// ---------------------------------------------------------------------------

// Parses sasrec_format.csv. Column order is discovered from the header line;
// required columns: user_id, sequence_item_ids, sequence_ratings,
// sequence_timestamps (extra columns such as a leading index are skipped).
ParsedSequences* parse_sasrec_csv(const char* path) {
  auto* out = new ParsedSequences();
  memset(out, 0, sizeof(ParsedSequences));

  FILE* f = fopen(path, "rb");
  if (!f) {
    out->error = dup_error(std::string("cannot open ") + path);
    return out;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    out->error = dup_error("short read");
    return out;
  }
  fclose(f);

  std::vector<int32_t> users;
  std::vector<int64_t> offsets{0};
  std::vector<int32_t> items;
  std::vector<int32_t> ratings;
  std::vector<int64_t> ts;

  const char* p = buf.c_str();
  // Header: find column positions.
  const char* line_end = strchr(p, '\n');
  if (!line_end) {
    out->error = dup_error("no header line");
    return out;
  }
  std::string header(p, line_end - p);
  // Tolerate CRLF line endings: strip a trailing '\r' so the last column
  // name still matches.
  if (!header.empty() && header.back() == '\r') header.pop_back();
  int user_col = -1, ids_col = -1, ratings_col = -1, ts_col = -1;
  {
    int col = 0;
    size_t start = 0;
    while (start <= header.size()) {
      size_t comma = header.find(',', start);
      std::string name = header.substr(
          start, comma == std::string::npos ? std::string::npos : comma - start);
      if (name == "user_id") user_col = col;
      if (name == "sequence_item_ids" || name == "item_ids") ids_col = col;
      if (name == "sequence_ratings" || name == "ratings") ratings_col = col;
      if (name == "sequence_timestamps" || name == "timestamps") ts_col = col;
      if (comma == std::string::npos) break;
      start = comma + 1;
      col++;
    }
  }
  if (user_col < 0 || ids_col < 0 || ratings_col < 0 || ts_col < 0) {
    out->error = dup_error("missing required columns in header: " + header);
    return out;
  }
  p = line_end + 1;

  std::vector<int32_t> row_items;
  std::vector<int32_t> row_ratings;
  std::vector<int64_t> row_ts;
  while (*p) {
    // Parse one CSV row; list fields are quoted and contain commas.
    int col = 0;
    int32_t uid = 0;
    row_items.clear();
    row_ratings.clear();
    row_ts.clear();
    bool row_ok = true;
    while (*p && *p != '\n') {
      // Locate the field boundary first (quote-aware), then parse it.
      // Fields never span lines in this format, so '\n' terminates even
      // inside quotes — an unterminated quote in one corrupt row must not
      // swallow the rest of the file.
      const char* field_start = p;
      bool in_quote = false;
      while (*p && *p != '\n' && (in_quote || *p != ',')) {
        if (*p == '"') in_quote = !in_quote;
        p++;
      }
      const char* field_end = p;
      if (col == user_col) {
        char* end = nullptr;
        uid = static_cast<int32_t>(strtoll(field_start, &end, 10));
      } else if (col == ids_col) {
        row_ok = parse_int_list(field_start, field_end, &row_items) && row_ok;
      } else if (col == ratings_col) {
        row_ok = parse_int_list(field_start, field_end, &row_ratings) && row_ok;
      } else if (col == ts_col) {
        row_ok = parse_int_list(field_start, field_end, &row_ts) && row_ok;
      }
      if (*p == ',') {
        p++;
        col++;
      }
    }
    if (*p == '\n') p++;
    if (!row_ok || row_items.empty() ||
        row_items.size() != row_ratings.size() ||
        row_items.size() != row_ts.size()) {
      out->skipped_rows++;  // surfaced to the caller — never a silent drop
      continue;
    }
    users.push_back(uid);
    items.insert(items.end(), row_items.begin(), row_items.end());
    ratings.insert(ratings.end(), row_ratings.begin(), row_ratings.end());
    ts.insert(ts.end(), row_ts.begin(), row_ts.end());
    offsets.push_back(static_cast<int64_t>(items.size()));
  }

  out->num_users = static_cast<int64_t>(users.size());
  out->total_events = static_cast<int64_t>(items.size());
  out->user_ids = static_cast<int32_t*>(malloc(users.size() * 4));
  memcpy(out->user_ids, users.data(), users.size() * 4);
  out->offsets = static_cast<int64_t*>(malloc(offsets.size() * 8));
  memcpy(out->offsets, offsets.data(), offsets.size() * 8);
  out->item_ids = static_cast<int32_t*>(malloc(items.size() * 4));
  memcpy(out->item_ids, items.data(), items.size() * 4);
  out->ratings = static_cast<int32_t*>(malloc(ratings.size() * 4));
  memcpy(out->ratings, ratings.data(), ratings.size() * 4);
  out->timestamps = static_cast<int64_t*>(malloc(ts.size() * 8));
  memcpy(out->timestamps, ts.data(), ts.size() * 8);
  return out;
}

void free_parsed_sequences(ParsedSequences* p) {
  if (!p) return;
  free(p->user_ids);
  free(p->offsets);
  free(p->item_ids);
  free(p->ratings);
  free(p->timestamps);
  free(p->error);
  delete p;
}

// ---------------------------------------------------------------------------
// Batch assembly: leave-one-out split + truncate-to-last-N + zero pad.
// Mirrors SequenceDataset.rows (rails_tpu/data/datasets.py), i.e. the
// semantics of `/root/reference/data/dataset.py:127-180`.
// ---------------------------------------------------------------------------

void assemble_batch(
    // Ragged store.
    const int32_t* user_ids, const int64_t* offsets, const int32_t* item_ids,
    const int32_t* ratings, const int64_t* timestamps,
    // Batch spec.
    const int64_t* user_indices, int64_t batch_size, int64_t max_seq_len,
    int64_t ignore_last_n,
    // Outputs: hist_* are (batch_size, max_seq_len) zero-initialized by the
    // caller; the rest are (batch_size,).
    int32_t* out_lengths, int32_t* out_hist_ids, int32_t* out_hist_ratings,
    int64_t* out_hist_ts, int32_t* out_target_ids, int32_t* out_target_ratings,
    int64_t* out_target_ts, int32_t* out_user_ids) {
  for (int64_t row = 0; row < batch_size; ++row) {
    const int64_t u = user_indices[row];
    int64_t start = offsets[u];
    int64_t end = offsets[u + 1] - ignore_last_n;
    // Caller guarantees end - start >= 2 (valid-user filter).
    const int64_t t = end - 1;  // target position
    out_target_ids[row] = item_ids[t];
    out_target_ratings[row] = ratings[t];
    out_target_ts[row] = timestamps[t];
    int64_t hist_len = t - start;
    if (hist_len > max_seq_len) {
      start = t - max_seq_len;
      hist_len = max_seq_len;
    }
    out_lengths[row] = static_cast<int32_t>(hist_len);
    int32_t* hid = out_hist_ids + row * max_seq_len;
    int32_t* hrt = out_hist_ratings + row * max_seq_len;
    int64_t* hts = out_hist_ts + row * max_seq_len;
    for (int64_t j = 0; j < hist_len; ++j) {
      hid[j] = item_ids[start + j];
      hrt[j] = ratings[start + j];
      hts[j] = timestamps[start + j];
    }
    out_user_ids[row] = user_ids[u];
  }
}

}  // extern "C"
