// Native SMILES -> graph featurizer (C++ twin of
// feta_tmlr_tpu/data/smiles.py, bit-identical outputs).
//
// The reference featurizes PCQM4M's 3.8M molecules with rdkit before
// training (run_transformer_gengcn_pcqm4m.py:30-32); the Python
// fallback here handles the same organic-subset grammar but at ~3.8M
// molecules the parse becomes an hours-long host bottleneck. This
// library runs the identical algorithm in C++ with a std::thread pool
// over molecules (std::thread, not OpenMP: GOMP spin-waits fight the
// XLA host thread pools, see collate_native.py's A/B note).
//
// Exact-match contract with smiles.py (asserted in
// tests/test_smiles_native.py): tokenizer (bracket atoms incl. isotope/
// charge/atom-map handling, organic + aromatic shorthands, ring-bond
// labels incl. %nn, branches, dot fragments), bridge-based ring
// detection, Daylight implicit-H valences, and the 9/3-column
// ogb.utils.smiles2graph feature schema with the same documented
// approximations (chirality/hybridization/radicals/stereo).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kAromatic = 1.5;

struct Atom {
  int z = 0;
  bool aromatic = false;
  int charge = 0;
  int h_count = 0;
  bool explicit_h = false;
  bool in_ring = false;
};

struct Bond {
  int a, b;
  double order;
};

struct SymEntry {
  const char* sym;
  int z;
};

// Insertion order matters: _assign_hydrogens looks up the FIRST symbol
// with a matching z (python dict order) — keep identical to smiles.py.
const SymEntry kSymbols[] = {
    {"H", 1},   {"He", 2},  {"Li", 3},  {"Be", 4},  {"B", 5},   {"C", 6},
    {"N", 7},   {"O", 8},   {"F", 9},   {"Ne", 10}, {"Na", 11}, {"Mg", 12},
    {"Al", 13}, {"Si", 14}, {"P", 15},  {"S", 16},  {"Cl", 17}, {"Ar", 18},
    {"K", 19},  {"Ca", 20}, {"Ti", 22}, {"Cr", 24}, {"Mn", 25}, {"Fe", 26},
    {"Co", 27}, {"Ni", 28}, {"Cu", 29}, {"Zn", 30}, {"Ga", 31}, {"Ge", 32},
    {"As", 33}, {"Se", 34}, {"Br", 35}, {"Zr", 40}, {"Mo", 42}, {"Ru", 44},
    {"Rh", 45}, {"Pd", 46}, {"Ag", 47}, {"Cd", 48}, {"In", 49}, {"Sn", 50},
    {"Sb", 51}, {"Te", 52}, {"I", 53},  {"Ba", 56}, {"W", 74},  {"Pt", 78},
    {"Au", 79}, {"Hg", 80}, {"Pb", 82}, {"Bi", 83},
};

int sym_z(const std::string& s) {
  for (const auto& e : kSymbols)
    if (s == e.sym) return e.z;
  return 0;
}

const char* z_sym(int z) {
  for (const auto& e : kSymbols)
    if (e.z == z) return e.sym;
  return nullptr;
}

bool organic(char c) {
  return c == 'B' || c == 'C' || c == 'N' || c == 'O' || c == 'P' ||
         c == 'S' || c == 'F' || c == 'I';
}

// _AROMATIC_SHORT: b c n o p s se as te
const char* aromatic_short(const std::string& s) {
  if (s == "b") return "B";
  if (s == "c") return "C";
  if (s == "n") return "N";
  if (s == "o") return "O";
  if (s == "p") return "P";
  if (s == "s") return "S";
  if (s == "se") return "Se";
  if (s == "as") return "As";
  if (s == "te") return "Te";
  return nullptr;
}

std::string capitalize(const std::string& s) {
  std::string r = s;
  if (!r.empty()) {
    r[0] = (char)toupper(r[0]);
    for (size_t i = 1; i < r.size(); ++i) r[i] = (char)tolower(r[i]);
  }
  return r;
}

// Daylight default valences (organic subset)
bool valences(const char* sym, std::vector<int>* out) {
  std::string s = sym;
  if (s == "B") *out = {3};
  else if (s == "C") *out = {4};
  else if (s == "N") *out = {3};
  else if (s == "O") *out = {2};
  else if (s == "P") *out = {3, 5};
  else if (s == "S") *out = {2, 4, 6};
  else if (s == "F" || s == "Cl" || s == "Br" || s == "I") *out = {1};
  else return false;
  return true;
}

struct Parser {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<int> stack;
  int prev = -1;
  double pending = -1.0;  // -1 = none
  std::map<int, std::pair<int, double>> rings;  // label -> (atom, order)

  void add_atom(const Atom& atom) {
    atoms.push_back(atom);
    int idx = (int)atoms.size() - 1;
    if (prev >= 0) {
      double order = pending;
      if (order < 0)
        order = (atoms[prev].aromatic && atom.aromatic) ? kAromatic : 1.0;
      bonds.push_back({prev, idx, order});
    }
    prev = idx;
    pending = -1.0;
  }

  // returns false when no atom precedes the ring digit (python builds a
  // bond with None there and raises a catchable TypeError downstream —
  // the molecule is rejected either way, here without UB)
  bool close_ring(int label) {
    if (prev < 0) return false;
    auto it = rings.find(label);
    if (it != rings.end()) {
      int other = it->second.first;
      double order0 = it->second.second;
      rings.erase(it);
      double order = pending >= 0 ? pending : order0;
      if (order < 0)
        order = (atoms[other].aromatic && atoms[prev].aromatic)
                    ? kAromatic : 1.0;
      bonds.push_back({other, prev, order});
    } else {
      rings[label] = {prev, pending};
    }
    pending = -1.0;
    return true;
  }

  // returns 0 ok, <0 parse error
  int parse(const char* s, int n) {
    int i = 0;
    while (i < n) {
      char ch = s[i];
      if (ch == '[') {
        int j = i + 1;
        while (j < n && s[j] != ']') ++j;
        if (j >= n) return -1;
        std::string body(s + i + 1, s + j);
        size_t k = 0;
        while (k < body.size() && isdigit((unsigned char)body[k])) ++k;
        std::string sym;
        for (int ln = 2; ln >= 1; --ln) {
          std::string cand = body.substr(k, ln);
          if ((int)cand.size() < ln) continue;
          if (sym_z(cand) || sym_z(capitalize(cand)) ||
              aromatic_short(cand)) {
            sym = cand;
            k += ln;
            break;
          }
        }
        if (sym.empty()) return -1;
        bool arom = islower((unsigned char)sym[0]);
        const char* shortc = aromatic_short(sym);
        std::string canonical =
            shortc ? shortc : (arom ? capitalize(sym) : sym);
        int z = sym_z(canonical);
        if (!z) return -1;
        int h_count = 0, charge = 0;
        while (k < body.size()) {
          char c = body[k];
          if (c == '@') {
            ++k;
          } else if (c == 'H') {
            ++k;
            std::string d;
            while (k < body.size() && isdigit((unsigned char)body[k]))
              d += body[k++];
            h_count = d.empty() ? 1 : atoi(d.c_str());
          } else if (c == '+' || c == '-') {
            int sign = c == '+' ? 1 : -1;
            ++k;
            std::string d;
            while (k < body.size() && isdigit((unsigned char)body[k]))
              d += body[k++];
            if (!d.empty()) {
              charge += sign * atoi(d.c_str());
            } else {
              charge += sign;
              while (k < body.size() && body[k] == c) {
                charge += sign;
                ++k;
              }
            }
          } else if (c == ':') {
            ++k;
            while (k < body.size() && isdigit((unsigned char)body[k])) ++k;
          } else {
            return -1;
          }
        }
        Atom a;
        a.z = z;
        a.aromatic = arom;
        a.charge = charge;
        a.h_count = h_count;
        a.explicit_h = true;
        add_atom(a);
        i = j + 1;
      } else if (isalpha((unsigned char)ch)) {
        std::string two(s + i, s + std::min(i + 2, n));
        if (two == "Cl" || two == "Br") {
          Atom a;
          a.z = sym_z(two);
          add_atom(a);
          i += 2;
        } else if (organic(ch)) {
          Atom a;
          a.z = sym_z(std::string(1, ch));
          add_atom(a);
          i += 1;
        } else if (aromatic_short(std::string(1, ch))) {
          Atom a;
          a.z = sym_z(aromatic_short(std::string(1, ch)));
          a.aromatic = true;
          add_atom(a);
          i += 1;
        } else {
          return -1;
        }
      } else if (ch == '-' || ch == '=' || ch == '#' || ch == ':') {
        pending = ch == '-' ? 1.0 : ch == '=' ? 2.0
                  : ch == '#' ? 3.0 : kAromatic;
        ++i;
      } else if (ch == '/' || ch == '\\') {
        pending = 1.0;
        ++i;
      } else if (isdigit((unsigned char)ch)) {
        if (!close_ring(ch - '0')) return -1;
        ++i;
      } else if (ch == '%') {
        // python slices s[i+1:i+3]; a truncated 1-digit slice shares the
        // plain single-digit label space (same dict key), replicate
        int j2 = std::min(i + 3, n);
        std::string lab(s + i + 1, s + j2);
        int key;
        if (lab.size() == 2 && isdigit((unsigned char)lab[0]) &&
            isdigit((unsigned char)lab[1]))
          key = 100 + (lab[0] - '0') * 10 + (lab[1] - '0');
        else if (lab.size() == 1 && isdigit((unsigned char)lab[0]))
          key = lab[0] - '0';
        else
          return -1;
        if (!close_ring(key)) return -1;
        i += 3;
      } else if (ch == '(') {
        stack.push_back(prev);
        ++i;
      } else if (ch == ')') {
        if (stack.empty()) return -1;
        prev = stack.back();
        stack.pop_back();
        ++i;
      } else if (ch == '.') {
        prev = -1;
        ++i;
      } else {
        return -1;
      }
    }
    if (!rings.empty()) return -1;
    return 0;
  }
};

// bridge detection (iterative DFS) -> sets atom.in_ring
void mark_rings(std::vector<Atom>& atoms, const std::vector<Bond>& bonds) {
  int n = (int)atoms.size();
  std::vector<std::vector<std::pair<int, int>>> adj(n);
  for (int bi = 0; bi < (int)bonds.size(); ++bi) {
    adj[bonds[bi].a].push_back({bonds[bi].b, bi});
    adj[bonds[bi].b].push_back({bonds[bi].a, bi});
  }
  std::vector<int> disc(n, -1), low(n, 0);
  std::vector<char> is_bridge(bonds.size(), 0);
  int timer = 0;
  struct Frame {
    int u, pedge;
    size_t it;
  };
  for (int root = 0; root < n; ++root) {
    if (disc[root] >= 0) continue;
    std::vector<Frame> work{{root, -1, 0}};
    disc[root] = low[root] = timer++;
    while (!work.empty()) {
      Frame& f = work.back();
      bool advanced = false;
      while (f.it < adj[f.u].size()) {
        auto [v, bi] = adj[f.u][f.it++];
        if (bi == f.pedge) continue;
        if (disc[v] < 0) {
          disc[v] = low[v] = timer++;
          work.push_back({v, bi, 0});
          advanced = true;
          break;
        }
        low[f.u] = std::min(low[f.u], disc[v]);
      }
      if (!advanced) {
        Frame done = work.back();
        work.pop_back();
        if (!work.empty()) {
          int p = work.back().u;
          low[p] = std::min(low[p], low[done.u]);
          if (low[done.u] > disc[p]) is_bridge[done.pedge] = 1;
        }
      }
    }
  }
  for (int bi = 0; bi < (int)bonds.size(); ++bi) {
    if (!is_bridge[bi]) {
      atoms[bonds[bi].a].in_ring = true;
      atoms[bonds[bi].b].in_ring = true;
    }
  }
}

void assign_hydrogens(std::vector<Atom>& atoms,
                      const std::vector<Bond>& bonds) {
  std::vector<double> order_sum(atoms.size(), 0.0);
  for (const auto& b : bonds) {
    order_sum[b.a] += b.order;
    order_sum[b.b] += b.order;
  }
  for (size_t ai = 0; ai < atoms.size(); ++ai) {
    Atom& atom = atoms[ai];
    if (atom.explicit_h) continue;
    const char* sym = z_sym(atom.z);
    std::vector<int> vals;
    if (!sym || !valences(sym, &vals)) {
      atom.h_count = 0;
      continue;
    }
    int need = (int)std::ceil(order_sum[ai] - 1e-9);
    int val = vals.back();
    for (int v : vals)
      if (v >= need) {
        val = v;
        break;
      }
    atom.h_count = std::max(val - need, 0);
  }
}

// one molecule: fills x [n,9], ei [2,cap_e] (row-strided), ea [cap_e,3]
int featurize_one(const char* s, int slen, int32_t* x, int32_t cap_atoms,
                  int32_t* ei, int32_t* ea, int32_t cap_edges,
                  int32_t* n_atoms, int32_t* n_edges) {
  Parser p;
  int rc = p.parse(s, slen);
  if (rc != 0) return rc;
  int n = (int)p.atoms.size();
  int e = 2 * (int)p.bonds.size();
  if (n > cap_atoms || e > cap_edges) return -2;
  mark_rings(p.atoms, p.bonds);
  assign_hydrogens(p.atoms, p.bonds);

  std::vector<double> max_order(n, 0.0);
  std::vector<int> n_double(n, 0), heavy_deg(n, 0);
  for (const auto& b : p.bonds) {
    heavy_deg[b.a]++;
    heavy_deg[b.b]++;
    for (int u : {b.a, b.b}) {
      max_order[u] = std::max(max_order[u], b.order);
      if (b.order == 2.0) n_double[u]++;
    }
  }
  for (int ai = 0; ai < n; ++ai) {
    const Atom& atom = p.atoms[ai];
    int hyb;
    if (max_order[ai] >= 3.0 || n_double[ai] >= 2) hyb = 0;        // SP
    else if (atom.aromatic || max_order[ai] == 2.0) hyb = 1;       // SP2
    else hyb = 2;                                                  // SP3
    int32_t* row = x + (size_t)ai * 9;
    row[0] = atom.z - 1;
    row[1] = 0;
    row[2] = heavy_deg[ai] + atom.h_count;
    row[3] = atom.charge + 5;
    row[4] = atom.h_count;
    row[5] = 0;
    row[6] = hyb;
    row[7] = atom.aromatic ? 1 : 0;
    row[8] = atom.in_ring ? 1 : 0;
  }
  int k = 0;
  for (const auto& b : p.bonds) {
    int btype = b.order == 1.0 ? 0 : b.order == 2.0 ? 1
                : b.order == 3.0 ? 2 : 3;
    bool sp2a = p.atoms[b.a].aromatic || max_order[b.a] >= 2.0;
    bool sp2b = p.atoms[b.b].aromatic || max_order[b.b] >= 2.0;
    int conj = (b.order == kAromatic || (sp2a && sp2b)) ? 1 : 0;
    const int pairs[2][2] = {{b.a, b.b}, {b.b, b.a}};
    for (const auto& uv : pairs) {
      ei[0 * (size_t)cap_edges + k] = uv[0];
      ei[1 * (size_t)cap_edges + k] = uv[1];
      ea[(size_t)k * 3 + 0] = btype;
      ea[(size_t)k * 3 + 1] = 0;
      ea[(size_t)k * 3 + 2] = conj;
      ++k;
    }
  }
  *n_atoms = n;
  *n_edges = e;
  return 0;
}

}  // namespace

extern "C" {

int32_t smiles_featurize(const char* s, int32_t slen, int32_t* x,
                         int32_t cap_atoms, int32_t* ei, int32_t* ea,
                         int32_t cap_edges, int32_t* n_atoms,
                         int32_t* n_edges) {
  return featurize_one(s, slen, x, cap_atoms, ei, ea, cap_edges, n_atoms,
                       n_edges);
}

// batch over molecules with a std::thread pool; per-molecule buffers at
// fixed capacities. status[i]: 0 ok, -1 parse error, -2 capacity.
int32_t smiles_featurize_batch(const char* buf, const int64_t* offsets,
                               int32_t n_mols, int32_t cap_atoms,
                               int32_t cap_edges, int32_t n_threads,
                               int32_t* x, int32_t* ei, int32_t* ea,
                               int32_t* n_atoms, int32_t* n_edges,
                               int32_t* status) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int t) {
    for (int i = t; i < n_mols; i += n_threads) {
      const char* s = buf + offsets[i];
      int slen = (int)(offsets[i + 1] - offsets[i]);
      status[i] = featurize_one(
          s, slen, x + (size_t)i * cap_atoms * 9, cap_atoms,
          ei + (size_t)i * 2 * cap_edges,
          ea + (size_t)i * cap_edges * 3, cap_edges, n_atoms + i,
          n_edges + i);
    }
  };
  if (n_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker, t);
    for (auto& t : ts) t.join();
  }
  return 0;
}

}  // extern "C"
