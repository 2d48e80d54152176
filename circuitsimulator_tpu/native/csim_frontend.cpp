// Native netlist frontend for circuitsimulator_tpu.
//
// Re-implements the Python frontend (circuitsimulator_tpu/netlist/) in C++
// with the same behavioral contract as the reference simulator's parser
// (reference: src/parser.cpp, src/circuit.cpp, include/utils.hpp — see
// SURVEY.md §2 parser feature matrix), plus this project's extensions
// (diodes, AC source specs, PULSE/PWL on V sources).
//
// Exposed as a C ABI consumed via ctypes (circuitsimulator_tpu/native/):
// the parser produces flat fixed-size record arrays (elements, nodes,
// models, probes, sweeps) over an interned string pool — i.e. it performs
// the full lex/parse/graph-build/equation-numbering pipeline natively and
// hands Python data that maps 1:1 onto the flat-array IR.
//
// Build: g++ -O2 -std=c++17 -shared -fPIC csim_frontend.cpp -o libcsim_frontend.so

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <limits>
#include <sstream>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// small utilities (behavior contract: utils.hpp:5-84)
// ----------------------------------------------------------------------
std::string lower(std::string s) {
    for (char& c : s) c = (char)std::tolower((unsigned char)c);
    return s;
}

std::string trim(const std::string& s) {
    size_t b = s.find_first_not_of(" \t\r\n");
    if (b == std::string::npos) return "";
    size_t e = s.find_last_not_of(" \t\r\n");
    return s.substr(b, e - b + 1);
}

bool is_ground(const std::string& name) {
    std::string l = lower(name);
    return l == "0" || l == "gnd";
}

double suffix_factor(const std::string& suf) {
    if (suf == "f") return 1e-15;
    if (suf == "p") return 1e-12;
    if (suf == "n") return 1e-9;
    if (suf == "u") return 1e-6;
    if (suf == "m") return 1e-3;
    if (suf == "k") return 1e3;
    if (suf == "meg") return 1e6;
    if (suf == "g") return 1e9;
    if (suf == "t") return 1e12;
    return 1.0;
}

// std::stod-style longest numeric prefix; returns chars consumed (0 if none)
size_t num_prefix(const std::string& s, double* out) {
    size_t i = 0;
    size_t n = s.size();
    if (i < n && (s[i] == '+' || s[i] == '-')) ++i;
    size_t digits_start = i;
    while (i < n && std::isdigit((unsigned char)s[i])) ++i;
    bool int_digits = i > digits_start;
    bool frac_digits = false;
    if (i < n && s[i] == '.') {
        ++i;
        size_t f0 = i;
        while (i < n && std::isdigit((unsigned char)s[i])) ++i;
        frac_digits = i > f0;
    }
    if (!int_digits && !frac_digits) return 0;
    size_t before_exp = i;
    if (i < n && (s[i] == 'e' || s[i] == 'E')) {
        size_t j = i + 1;
        if (j < n && (s[j] == '+' || s[j] == '-')) ++j;
        size_t d0 = j;
        while (j < n && std::isdigit((unsigned char)s[j])) ++j;
        if (j > d0) i = j; else i = before_exp;  // incomplete exponent
    }
    *out = std::strtod(s.substr(0, i).c_str(), nullptr);
    return i;
}

// parse_spice_number: numeric prefix * suffix factor; fallback: number
// before the first alpha char; no number at all -> 0.0; unparseable -> fail
bool parse_spice(const std::string& token, double* out) {
    std::string s = lower(token);
    double base;
    size_t used = num_prefix(s, &base);
    if (used > 0) {
        std::string suf = s.substr(used);
        *out = suf.empty() ? base : base * suffix_factor(suf);
        return true;
    }
    size_t pos = std::string::npos;
    for (size_t i = 0; i < s.size(); ++i) {
        if (std::isalpha((unsigned char)s[i])) { pos = i; break; }
    }
    if (pos == std::string::npos) { *out = 0.0; return true; }
    std::string head = s.substr(0, pos);
    used = num_prefix(head, &base);
    if (used == 0 || used != head.size()) return false;
    *out = base * suffix_factor(s.substr(pos));
    return true;
}

// ----------------------------------------------------------------------
// arithmetic expressions for .PARAM / {...} values — mirror of
// circuitsimulator_tpu/utils/expr.py (same grammar, same double ops, so
// both frontends produce bit-identical element values)
// ----------------------------------------------------------------------
struct ExprEval {
    struct Tok { int kind; std::string text; };  // 0 num 1 name 2 op 3 ( 4 ) 5 ,
    std::vector<Tok> toks;
    size_t pos = 0;
    const std::unordered_map<std::string, double>* bindings;
    bool ok = true;
    // lenient = SYNTAX validation mode for behavioral expressions: bare
    // names and v()/i() probes are accepted (value 0), math failures
    // (division by zero, overflow) do not fail — mirrors Python
    // parse_expr(probes=True), which parses without evaluating
    bool lenient = false;
    bool allow_probes = true;   // lenient sub-mode: v()/i() accepted

    bool fail() { ok = false; return false; }

    bool tokenize(const std::string& s) {
        size_t i = 0, n = s.size();
        while (i < n) {
            char c = s[i];
            if (std::isspace((unsigned char)c)) { ++i; continue; }
            if (std::isdigit((unsigned char)c) ||
                (c == '.' && i + 1 < n &&
                 std::isdigit((unsigned char)s[i + 1]))) {
                size_t j = i;
                while (j < n && (std::isdigit((unsigned char)s[j]) ||
                                 s[j] == '.')) ++j;
                if (j < n && (s[j] == 'e' || s[j] == 'E')) {
                    size_t k = j + 1;
                    if (k < n && (s[k] == '+' || s[k] == '-')) ++k;
                    if (k < n && std::isdigit((unsigned char)s[k])) {
                        j = k;
                        while (j < n && std::isdigit((unsigned char)s[j])) ++j;
                    }
                }
                while (j < n && std::isalpha((unsigned char)s[j])) ++j;
                toks.push_back({0, s.substr(i, j - i)});
                i = j;
            } else if (std::isalpha((unsigned char)c) || c == '_') {
                size_t j = i;
                while (j < n && (std::isalnum((unsigned char)s[j]) ||
                                 s[j] == '_')) ++j;
                toks.push_back({1, s.substr(i, j - i)});
                i = j;
            } else if (c == '*' && i + 1 < n && s[i + 1] == '*') {
                toks.push_back({2, "**"});
                i += 2;
            } else if (std::strchr("+-*/%^", c)) {
                toks.push_back({2, std::string(1, c)});
                ++i;
            } else if (c == '(') {
                toks.push_back({3, "("});
                ++i;
            } else if (c == ')') {
                toks.push_back({4, ")"});
                ++i;
            } else if (c == ',') {
                toks.push_back({5, ","});
                ++i;
            } else {
                return false;
            }
        }
        return !toks.empty();
    }

    const Tok* peek() { return pos < toks.size() ? &toks[pos] : nullptr; }
    const Tok* next() {
        const Tok* t = peek();
        if (t) ++pos; else fail();
        return t;
    }

    double additive() {
        double v = multiplicative();
        while (ok) {
            const Tok* t = peek();
            if (t && t->kind == 2 && (t->text == "+" || t->text == "-")) {
                ++pos;
                double r = multiplicative();
                v = t->text == "+" ? v + r : v - r;
            } else {
                break;
            }
        }
        return v;
    }

    double multiplicative() {
        double v = unary();
        while (ok) {
            const Tok* t = peek();
            if (t && t->kind == 2 &&
                (t->text == "*" || t->text == "/" || t->text == "%")) {
                ++pos;
                double r = unary();
                if (t->text == "*") {
                    v = v * r;
                } else if (r == 0.0) {
                    if (!lenient) { fail(); return 0.0; }   // py raises
                    v = 0.0;
                } else if (t->text == "/") {
                    v = v / r;
                } else {
                    v = std::fmod(v, r);
                }
            } else {
                break;
            }
        }
        return v;
    }

    double unary() {
        const Tok* t = peek();
        if (t && t->kind == 2 && (t->text == "+" || t->text == "-")) {
            ++pos;
            double v = unary();
            return t->text == "-" ? -v : v;
        }
        return power();
    }

    double power() {
        double v = atom();
        const Tok* t = peek();
        if (ok && t && t->kind == 2 && (t->text == "**" || t->text == "^")) {
            ++pos;
            return std::pow(v, unary());
        }
        return v;
    }

    double atom() {
        const Tok* t = next();
        if (!t) return 0.0;
        if (t->kind == 0) {
            double d;
            if (!parse_spice(t->text, &d)) { fail(); return 0.0; }
            return d;
        }
        if (t->kind == 1) {
            std::string name = lower(t->text);
            const Tok* nx = peek();
            if (lenient && allow_probes && nx && nx->kind == 3 &&
                (name == "v" || name == "i")) {
                // probe syntax v(node[,ref]) / i(elem): args are raw
                // name/number tokens (mirror of _Parser._probe)
                ++pos;                        // consume '('
                const Tok* a2 = next();
                if (!a2 || (a2->kind != 0 && a2->kind != 1)) {
                    fail();
                    return 0.0;
                }
                if (name == "v" && peek() && peek()->kind == 5) {
                    ++pos;
                    const Tok* b2 = next();
                    if (!b2 || (b2->kind != 0 && b2->kind != 1)) {
                        fail();
                        return 0.0;
                    }
                }
                const Tok* rp2 = next();
                if (!rp2 || rp2->kind != 4) fail();
                return 0.0;
            }
            if (nx && nx->kind == 3) {       // function call
                ++pos;
                std::vector<double> args{additive()};
                while (ok && peek() && peek()->kind == 5) {
                    ++pos;
                    args.push_back(additive());
                }
                const Tok* rp = next();
                if (!rp || rp->kind != 4) { fail(); return 0.0; }
                return call(name, args);
            }
            auto it = bindings->find(name);
            if (it != bindings->end()) return it->second;
            if (name == "pi") return M_PI;
            if (name == "e") return M_E;
            if (lenient) return 0.0;    // bare names resolve at lowering
            fail();
            return 0.0;
        }
        if (t->kind == 3) {
            double v = additive();
            const Tok* rp = next();
            if (!rp || rp->kind != 4) fail();
            return v;
        }
        fail();
        return 0.0;
    }

    double call(const std::string& f, const std::vector<double>& a) {
        if (a.size() == 1) {
            double x = a[0];
            if (f == "sin") return std::sin(x);
            if (f == "cos") return std::cos(x);
            if (f == "tan") return std::tan(x);
            if (f == "asin") return std::asin(x);
            if (f == "acos") return std::acos(x);
            if (f == "atan") return std::atan(x);
            if (f == "sinh") return std::sinh(x);
            if (f == "cosh") return std::cosh(x);
            if (f == "tanh") return std::tanh(x);
            if (f == "exp") return std::exp(x);
            if (f == "ln" || f == "log") return std::log(x);
            if (f == "log10") return std::log10(x);
            if (f == "sqrt") return std::sqrt(x);
            if (f == "abs") return std::fabs(x);
            if (f == "floor") return std::floor(x);
            if (f == "ceil") return std::ceil(x);
        } else if (a.size() == 2) {
            if (f == "pow") return std::pow(a[0], a[1]);
            if (f == "atan2") return std::atan2(a[0], a[1]);
            if (f == "min") return std::min(a[0], a[1]);
            if (f == "max") return std::max(a[0], a[1]);
        }
        fail();
        return 0.0;
    }
};

// returns false on any parse/eval problem (mirrors ExprError)
bool eval_expr(const std::string& s,
               const std::unordered_map<std::string, double>& bindings,
               double* out) {
    ExprEval p;
    p.bindings = &bindings;
    if (!p.tokenize(s)) return false;
    double v = p.additive();
    if (!p.ok || p.peek() != nullptr) return false;
    if (!std::isfinite(v)) return false;    // py: ZeroDivision/Overflow/domain
    *out = v;
    return true;
}

// SYNTAX-only validation of an expression; probes=true additionally
// accepts v()/i() — mirror of parse_expr(expr, probes=...) succeeding
bool validate_expr_syntax(const std::string& s, bool probes) {
    static const std::unordered_map<std::string, double> kEmpty;
    ExprEval p;
    p.bindings = &kEmpty;
    p.lenient = true;
    p.allow_probes = probes;
    if (!p.tokenize(s)) return false;
    p.additive();
    return p.ok && p.peek() == nullptr;
}

bool validate_behavioral_expr(const std::string& s) {
    return validate_expr_syntax(s, true);
}

// DEV=/LOT= tolerance value; `5%` means 0.05 (mirror of parser._tolval)
bool tol_value(const std::string& s, double* out_v) {
    if (!s.empty() && s.back() == '%') {
        if (!parse_spice(s.substr(0, s.size() - 1), out_v)) return false;
        *out_v /= 100.0;
        return true;
    }
    return parse_spice(s, out_v);
}

// re-join tokens so each {...} group (which may contain spaces) becomes
// part of a single token — shared by the .PARAM machinery and the
// subcircuit flattener (mirror of netlist/subckt.py:_merge_brace_groups)
std::vector<std::string> merge_brace_groups(
        const std::vector<std::string>& tokens) {
    std::vector<std::string> out;
    std::string buf;
    bool open = false;
    long depth = 0;
    auto delta = [](const std::string& t) {
        long d = 0;
        for (char c : t) d += c == '{' ? 1 : c == '}' ? -1 : 0;
        return d;
    };
    for (const auto& tok : tokens) {
        if (!open) {
            long d = delta(tok);
            if (tok.find('{') == std::string::npos || d == 0) {
                out.push_back(tok);
                continue;
            }
            buf = tok;
            depth = d;
            open = true;
        } else {
            buf += " " + tok;
            depth += delta(tok);
        }
        if (depth <= 0) {
            out.push_back(buf);
            open = false;
        }
    }
    if (open) out.push_back(buf);
    return out;
}

// 'a = b' -> 'a=b' across a joined token tail
std::string normalize_eq(const std::vector<std::string>& tokens) {
    std::string text;
    for (size_t i = 0; i < tokens.size(); ++i) {
        if (!text.empty()) text += " ";
        text += tokens[i];
    }
    std::string norm;
    for (size_t i = 0; i < text.size(); ++i) {
        if (text[i] == ' ' &&
            ((i + 1 < text.size() && text[i + 1] == '=') ||
             (!norm.empty() && norm.back() == '='))) continue;
        norm += text[i];
    }
    return norm;
}

// ----------------------------------------------------------------------
// flat output records (mirrored by ctypes structs on the Python side)
// ----------------------------------------------------------------------
#pragma pack(push, 1)
struct ElementRec {
    int32_t kind;       // 0=R 1=C 2=L 3=V 4=I 5=M 6=D 7=Q 8=E 9=G 10=F 11=H
    int32_t name_off;
    int32_t nodes[4];   // node ids; -1 unused
    int32_t branch_eq;  // -1 unless V/L
    double value;       // R/C/L value
    // MOS
    int32_t is_p;
    double vth, k, lam, cj0, kf, af;
    // diode
    double i_sat, n_ideal;
    // BJT (Ebers-Moll)
    double bf, br;
    // controlled sources (E/G/F/H): gain in `value`; F/H control element
    int32_t ctrl_off;   // str offset of the controlling V source, -1 none
    // source spec
    double dc, ac_mag, ac_phase;
    int32_t wave_kind;  // 0 none 1 pulse 2 sin 3 pwl 4 exp 5 sffm
    double pulse[7];    // v1 v2 td tr tf ton per
    double sin5[5];     // v0 va freq td phi
    int32_t pwl_off, pwl_n;  // into pwl pool (pairs t,v interleaved)
    int32_t ctrl2_off;  // K element (kind 12): second coupled inductor
    // switches (kinds 13=S, 14=W): resolved model parameters
    double ron, roff, s_vt, s_vh;
    // transmission line (kind 16=T): impedance/delay + 2nd branch unknown
    double z0, td;
    int32_t branch_eq2;
    // behavioral source (kind 17=B): expression text + V/I form flag
    int32_t bexpr_off;
    int32_t b_is_v;
    // MOS body effect (extension, default off)
    double gamma, phi;
    double vaf;         // BJT Early voltage (extension); 0 = off
    double tc1, tc2;    // resistor temperature coefficients (ABI v8)
    double cje, cjc;    // BJT junction capacitances (ABI v9); 0 = off
    double dev_tol, lot_tol;  // R/C/L Monte-Carlo tolerances (ABI v10)
    double d_bv, d_ibv;       // diode reverse breakdown (ABI v11)
    double eg, xti;           // IS(T) scaling, diode + BJT (ABI v12)
    double ic;                // C/L IC= initial condition (ABI v13)
    int32_t has_ic;           // 1 when an IC= was given (UIC only)
    double tn_na, tn_nt;      // TRNOISE(na nt) on V/I sources (ABI v14)
    double tn_alpha, tn_namp; // 1/f^alpha flicker component (ABI v15)
    double coxwl;             // MOS COX*W*L (ABI v16; charge cap model)
};

struct NodeRec {
    int32_t name_off;
    int32_t eq_index;
};

struct ProbeRec {
    int32_t analysis;   // 0 none 1 op 2 dc 3 ac 4 tran 5 hb
    int32_t kind;       // 0 nv 1 dv 2 br
    int32_t node1_off, node2_off, ele_off, port_off;
    int32_t mod;        // 0 none/mag 1 db 2 ph 3 re 4 im (VDB/VP/VR/VI)
};

struct SweepRec {
    int32_t source_off;
    double start, stop, step;
    // nested outer sweep (extension; ABI v7) — source2_off < 0 when absent
    int32_t source2_off;
    double start2, stop2, step2;
};

struct MeasureRec {     // .MEASURE card (extension)
    int32_t analysis;   // probe analysis codes: 2 dc, 3 ac, 4 tran
    int32_t name_off;
    int32_t kind;       // 0 stat 1 trig_targ 2 when 3 find_when 4 find_at
    int32_t stat_off;   // interned stat keyword (avg/rms/...), -1 if none
    ProbeRec p1;        // stat / FIND probe
    ProbeRec p2;        // TRIG / WHEN probe
    ProbeRec p3;        // TARG probe
    double val1, val2;
    int32_t edge1, edge2;   // 0 cross 1 rise 2 fall
    int32_t n1, n2;         // 1-based occurrence; -1 = LAST
    double td1, td2;
    double t_from, t_to;    // window; t_to = +inf when unset
    double at;
    int32_t expr_off;       // kind 5 (PARAM=): derived expression, -1 else
};

struct IcRec {          // .IC V(node)=value (extension)
    int32_t node_off;
    double value;
};

struct OptRec {         // .OPTIONS key=value (extension; value as string)
    int32_t name_off;
    int32_t value_off;
};

struct ParamRec {       // resolved .PARAM entry (extension)
    int32_t name_off;
    double value;
};

struct StepRec {        // .STEP card (extension)
    int32_t kind;       // 0 param, 1 source
    int32_t name_off;
    int32_t val_off;    // offset into step_pool
    int32_t n_vals;
};

struct Config {
    int32_t do_op;
    int32_t tran_enabled;
    double tstep, tstop, tstart;
    int32_t ac_enabled;
    int32_t ac_sweep;   // 0 lin 1 dec 2 oct
    int32_t ac_npoints;
    double fstart, fstop;
    int32_t hb_enabled;
    double hb_f0;
    int32_t hb_nharm;
    // extra tones of a multi-tone `.hb f0 n0 f1 n1 ...` card (extension)
    int32_t hb_extra_ntones;
    double hb_extra_f[4];
    int32_t hb_extra_n[4];
    // .NOISE (extension): V(out[,ref]) [src] [lin|dec|oct n fstart fstop]
    int32_t noise_enabled;
    int32_t noise_out_off, noise_ref_off, noise_src_off;  // -1 = absent
    int32_t noise_sweep;     // -1 = fall back to the .AC sweep; else 0/1/2
    int32_t noise_npoints;
    double noise_fstart, noise_fstop;
    // .FOUR (extension): probes carry analysis tag 6 in the probe list
    int32_t four_enabled;
    double four_f0;
    int32_t tran_uic;   // .TRAN ... UIC (extension)
    int32_t temp_set;   // .TEMP given (extension)
    double temp_c;
    int32_t sens_out_off, sens_ref_off;  // .SENS V(out[,ref]); -1 absent
    int32_t pz_out_off, pz_ref_off, pz_src_off;  // .PZ (extension)
    // .TF V(out[,ref])|I(elem) src (extension)
    int32_t tf_enabled;
    int32_t tf_out_kind;    // 0 = V(out[,ref]), 1 = I(elem)
    int32_t tf_out_off, tf_ref_off, tf_elem_off, tf_src_off;
};
#pragma pack(pop)

struct Result {
    std::vector<ElementRec> elements;
    std::vector<NodeRec> nodes;
    std::vector<ProbeRec> probes;
    std::vector<SweepRec> sweeps;
    std::vector<IcRec> ics;
    std::vector<IcRec> nodesets;
    std::vector<OptRec> options;
    std::vector<MeasureRec> measures;
    std::vector<ParamRec> params;
    std::vector<StepRec> steps;
    std::vector<double> step_pool;
    std::vector<double> pwl_pool;
    std::string str_pool;
    std::string diagnostics;
    Config config{};
};

struct MosModel {
    bool is_p = false;
    double vt = 0.7, mu = 1e-3, cox = 1e-3, lambda_ = 0.0, cj0 = 0.0;
    double kf = 0.0, af = 1.0;  // flicker-noise coefficients (extension)
    double gamma = 0.0, phi = 0.6;  // body effect (extension, default off)
};

struct BjtModel {
    bool is_pnp = false;
    double i_sat = 1e-16, bf = 100.0, br = 1.0;
    double vaf = 0.0;   // Early voltage (extension); 0 = off
    double cje = 0.0, cjc = 0.0;  // junction capacitances (extension)
    double eg = 0.0, xti = 0.0;   // IS(T) scaling (extension)
};

struct SwModel {    // switch model card (extension)
    double ron = 1.0, roff = 1e12, vt = 0.0, vh = 0.0;
};

struct JfetModel {  // JFET model card (extension)
    bool is_p = false;
    double vto = -2.0, beta = 1e-4, lambda_ = 0.0;
};

struct Statement {
    int line_no;
    std::string raw;
    std::vector<std::string> tokens;
};


// ----------------------------------------------------------------------
// .SUBCKT / .ENDS / X-instance flattening (extension; statement rewrite
// mirroring netlist/subckt.py — see its docstring for the naming rules)
// ----------------------------------------------------------------------
struct SubcktDef {
    std::vector<std::string> ports;
    // `PARAMS:` defaults, in declaration order (netlist/subckt.py)
    std::vector<std::pair<std::string, std::string>> defaults;
    std::vector<Statement> body;
};

class SubcktFlattener {
public:
    std::ostringstream& diag;
    std::unordered_map<std::string, SubcktDef> defs;
    std::vector<Statement> out;
    static const int kMaxDepth = 20;

    explicit SubcktFlattener(std::ostringstream& d) : diag(d) {}

    // global `.PARAM` table (resolved in run(); the parser re-resolves
    // it later for its own substitution pass — same algorithm, same
    // values, so early substitution inside subckt bodies is consistent)
    std::unordered_map<std::string, double> global_values;
    // `.GLOBAL` nodes: keep their name inside every definition
    std::unordered_set<std::string> global_nodes;

    void warn(int line_no, const std::string& msg) {
        diag << "Line " << line_no << ": " << msg << "\n";
    }

    // partition a token tail into plain tokens + name=expr assignments
    // (mirror of netlist/subckt.py:_split_assignments)
    void split_assignments(
            const std::vector<std::string>& tokens, int line_no,
            std::vector<std::string>* plain,
            std::vector<std::pair<std::string, std::string>>* assigns,
            std::vector<std::string>* raw) {
        std::string norm = normalize_eq(tokens);
        std::vector<std::string> toks;
        {
            std::istringstream iss(norm);
            std::string tok;
            while (iss >> tok) toks.push_back(tok);
        }
        bool in_assigns = false;
        for (const auto& tok : merge_brace_groups(toks)) {
            std::string lo = lower(tok);
            if (lo == "params:" || lo == "param:") {
                in_assigns = true;
                continue;
            }
            size_t eq = tok.find('=');
            if (eq != std::string::npos) {
                in_assigns = true;
                std::string name = tok.substr(0, eq);
                std::string expr = trim(tok.substr(eq + 1));
                if (expr.size() >= 2 && expr.front() == '{' &&
                    expr.back() == '}')
                    expr = expr.substr(1, expr.size() - 2);
                if (name.empty() || expr.empty()) {
                    warn(line_no,
                         "invalid parameter assignment: '" + tok + "'");
                    continue;
                }
                assigns->emplace_back(lower(name), expr);
                if (raw) raw->push_back(tok);
            } else if (in_assigns) {
                warn(line_no, "stray token '" + tok +
                              "' after parameter assignments; ignored");
            } else {
                plain->push_back(tok);
            }
        }
    }

    // `Xn net... subname [PARAMS:] [name=expr ...]`; false if malformed
    bool split_instance(
            const std::vector<std::string>& toks, int line_no,
            std::vector<std::string>* nets, std::string* subname,
            std::vector<std::pair<std::string, std::string>>* assigns,
            std::vector<std::string>* raw) {
        std::vector<std::string> plain;
        std::vector<std::string> tail(toks.begin() + 1, toks.end());
        split_assignments(tail, line_no, &plain, assigns, raw);
        if (plain.empty()) return false;
        *subname = plain.back();
        nets->assign(plain.begin(), plain.end() - 1);
        return true;
    }

    // replace each {expr} group that evaluates under `scope`; groups
    // that do not evaluate keep their token verbatim for the parser's
    // global substitution pass (mirror of _substitute_scoped)
    Statement substitute_scoped(
            const Statement& st,
            const std::unordered_map<std::string, double>& scope) {
        bool braced = false;
        for (const auto& tok : st.tokens)
            braced = braced || tok.find('{') != std::string::npos;
        if (!braced) return st;
        Statement r = st;
        std::vector<std::string> outv;
        for (const auto& tok : merge_brace_groups(st.tokens)) {
            if (tok.find('{') == std::string::npos) {
                outv.push_back(tok);
                continue;
            }
            std::string res;
            bool failed = false;
            size_t i = 0;
            while (i < tok.size()) {
                if (tok[i] == '{') {
                    size_t j = tok.find('}', i);
                    double v;
                    if (j == std::string::npos ||
                        !eval_expr(tok.substr(i + 1, j - i - 1),
                                   scope, &v)) {
                        failed = true;
                        break;
                    }
                    char buf[40];
                    std::snprintf(buf, sizeof buf, "%.17g", v);
                    res += buf;
                    i = j + 1;
                } else {
                    res += tok[i];
                    ++i;
                }
            }
            outv.push_back(failed ? tok : res);
        }
        r.tokens = std::move(outv);
        std::string raw;
        for (const auto& t : r.tokens) {
            if (!raw.empty()) raw += " ";
            raw += t;
        }
        r.raw = raw;
        return r;
    }

    static void node_range(char c0, size_t* lo, size_t* hi) {
        switch (c0) {
            case 'M': case 'Q': case 'J': *lo = 1; *hi = 4; break;
            case 'E': case 'G': case 'S': case 'T': *lo = 1; *hi = 5; break;
            case 'R': case 'C': case 'L': case 'V': case 'I':
            case 'D': case 'F': case 'H': case 'W': case 'B':
                *lo = 1; *hi = 3; break;
            default: *lo = 1; *hi = 1; break;
        }
    }

    Statement rename(const Statement& st,
                     const std::unordered_map<std::string, std::string>& map,
                     const std::string& prefix) {
        Statement r = st;
        char c0 = (char)std::toupper((unsigned char)r.tokens[0][0]);
        r.tokens[0] += "@" + prefix;
        auto map_node = [&](std::string& t) {
            if (is_ground(t) || global_nodes.count(t)) return;
            auto it = map.find(t);
            t = (it != map.end()) ? it->second : prefix + "." + t;
        };
        long n_poly = -1;
        if ((c0 == 'E' || c0 == 'G' || c0 == 'F' || c0 == 'H') &&
            r.tokens.size() > 3) {
            std::string p3 = lower(r.tokens[3]);
            if (p3.rfind("poly(", 0) == 0 && p3.size() > 6 &&
                p3.back() == ')') {
                char* e2 = nullptr;
                long n = std::strtol(p3.c_str() + 5, &e2, 10);
                if (e2 && *e2 == ')' && e2 != p3.c_str() + 5) n_poly = n;
            }
        }
        if (c0 == 'X') {
            // only the net tokens are renamed; the subckt name and any
            // parameter assignments pass through untouched
            std::vector<std::string> nets, raw_assigns;
            std::string subname;
            std::vector<std::pair<std::string, std::string>> assigns;
            if (split_instance(r.tokens, r.line_no, &nets, &subname,
                               &assigns, &raw_assigns)) {
                std::vector<std::string> toks2{r.tokens[0]};
                for (auto& n : nets) {
                    map_node(n);
                    toks2.push_back(n);
                }
                toks2.push_back(subname);
                for (const auto& a : raw_assigns) toks2.push_back(a);
                r.tokens = std::move(toks2);
            }
        } else if (n_poly >= 0) {
            // POLY(n): output nodes + n control node pairs (E/G) or n
            // controlling element names (F/H); coefficients untouched
            map_node(r.tokens[1]);
            map_node(r.tokens[2]);
            if (c0 == 'E' || c0 == 'G') {
                for (size_t j = 4;
                     j < (size_t)(4 + 2 * n_poly) && j < r.tokens.size(); ++j)
                    map_node(r.tokens[j]);
            } else {
                for (size_t j = 4;
                     j < (size_t)(4 + n_poly) && j < r.tokens.size(); ++j)
                    r.tokens[j] += "@" + prefix;
            }
        } else {
            size_t lo, hi;
            node_range(c0, &lo, &hi);
            for (size_t j = lo; j < hi && j < r.tokens.size(); ++j)
                map_node(r.tokens[j]);
            if ((c0 == 'F' || c0 == 'H' || c0 == 'W') && r.tokens.size() > 3)
                r.tokens[3] += "@" + prefix;
            if (c0 == 'K') {
                if (r.tokens.size() > 1) r.tokens[1] += "@" + prefix;
                if (r.tokens.size() > 2) r.tokens[2] += "@" + prefix;
            }
        }
        std::string raw;
        for (const auto& t : r.tokens) {
            if (!raw.empty()) raw += " ";
            raw += t;
        }
        r.raw = raw;
        return r;
    }

    void collect(const std::vector<Statement>& seq,
                 std::vector<Statement>& sink, bool nested) {
        size_t i = 0;
        while (i < seq.size()) {
            const Statement& st = seq[i];
            std::string head = st.tokens.empty() ? ""
                                                 : lower(st.tokens[0]);
            if (head == ".subckt") {
                if (nested)
                    warn(st.line_no,
                         "nested .SUBCKT definition; registering it globally");
                if (st.tokens.size() < 2)
                    warn(st.line_no, "invalid .SUBCKT: " + st.raw);
                std::string name = st.tokens.size() > 1
                                       ? lower(st.tokens[1]) : "";
                std::vector<Statement> body;
                int depth = 1;
                ++i;
                bool closed = false;
                while (i < seq.size()) {
                    std::string h2 = seq[i].tokens.empty() ? ""
                                         : lower(seq[i].tokens[0]);
                    if (h2 == ".subckt") ++depth;
                    else if (h2 == ".ends") {
                        if (--depth == 0) { closed = true; break; }
                    }
                    body.push_back(seq[i]);
                    ++i;
                }
                if (!closed)
                    warn(st.line_no, ".SUBCKT " + name + " missing .ENDS");
                ++i;  // skip the .ends
                SubcktDef def;
                if (st.tokens.size() > 2) {
                    std::vector<std::string> tail(st.tokens.begin() + 2,
                                                  st.tokens.end());
                    split_assignments(tail, st.line_no, &def.ports,
                                      &def.defaults, nullptr);
                }
                collect(body, def.body, true);
                if (!name.empty()) defs[name] = std::move(def);
            } else if (head == ".ends") {
                warn(st.line_no, ".ENDS without .SUBCKT; ignored");
                ++i;
            } else if (head == ".model" && nested) {
                out.push_back(st);  // hoist to top (global model registry)
                ++i;
            } else {
                sink.push_back(st);
                ++i;
            }
        }
    }

    void expand(const Statement& st, int depth,
                const std::unordered_map<std::string, double>& caller_scope,
                std::vector<Statement>& result) {
        if (st.tokens.empty() ||
            std::toupper((unsigned char)st.tokens[0][0]) != 'X') {
            result.push_back(st);
            return;
        }
        if (depth > kMaxDepth) {
            warn(st.line_no, "subcircuit nesting too deep (cycle?); "
                             "dropping " + st.tokens[0]);
            return;
        }
        if (st.tokens.size() < 2) {
            warn(st.line_no, "invalid instance: " + st.raw);
            return;
        }
        std::vector<std::string> nets;
        std::string subtok;
        std::vector<std::pair<std::string, std::string>> overrides;
        if (!split_instance(st.tokens, st.line_no, &nets, &subtok,
                            &overrides, nullptr)) {
            warn(st.line_no, "invalid instance: " + st.raw);
            return;
        }
        std::string subname = lower(subtok);
        auto it = defs.find(subname);
        if (it == defs.end()) {
            warn(st.line_no, "unknown subcircuit '" + subtok +
                             "'; dropping " + st.tokens[0]);
            return;
        }
        const SubcktDef& def = it->second;
        if (nets.size() != def.ports.size()) {
            warn(st.line_no, st.tokens[0] + ": " +
                 std::to_string(nets.size()) +
                 " nets for " + std::to_string(def.ports.size()) +
                 " ports of " + subname + "; dropping instance");
            return;
        }
        std::unordered_map<std::string, std::string> map;
        for (size_t j = 0; j < nets.size(); ++j)
            map[def.ports[j]] = nets[j];
        // bind parameters: defaults left-to-right (may reference globals
        // and earlier defaults), then instance overrides evaluated in
        // the CALLER's scope (mirror of netlist/subckt.py)
        std::unordered_map<std::string, double> scope = global_values;
        std::unordered_map<std::string, double> bindings;
        for (const auto& d : def.defaults) {
            std::unordered_map<std::string, double> env = global_values;
            for (const auto& b : bindings) env[b.first] = b.second;
            double v;
            if (eval_expr(d.second, env, &v)) {
                bindings[d.first] = v;
            } else {
                warn(st.line_no, st.tokens[0] + ": cannot resolve default "
                     + d.first + "='" + d.second + "' of " + subname);
            }
        }
        for (const auto& o : overrides) {
            bool declared = false;
            for (const auto& d : def.defaults)
                declared = declared || d.first == o.first;
            if (!declared)
                warn(st.line_no, st.tokens[0] + ": '" + o.first +
                     "' is not a parameter of " + subname +
                     "; binding anyway");
            double v;
            if (eval_expr(o.second, caller_scope, &v)) {
                bindings[o.first] = v;
            } else {
                warn(st.line_no, st.tokens[0] + ": cannot resolve "
                     "parameter " + o.first + "='" + o.second + "'");
            }
        }
        for (const auto& b : bindings) scope[b.first] = b.second;
        // instance-local `.PARAM` cards: order-independent within the
        // body (same forward-reference iteration as the global table)
        std::vector<std::pair<std::string, std::string>> ldefs;
        std::vector<int> ldef_lines;
        for (const auto& bst : def.body) {
            if (!bst.tokens.empty() && lower(bst.tokens[0]) == ".param") {
                std::vector<std::string> plain;
                std::vector<std::string> tail(bst.tokens.begin() + 1,
                                              bst.tokens.end());
                std::vector<std::pair<std::string, std::string>> assigns;
                split_assignments(tail, bst.line_no, &plain, &assigns,
                                  nullptr);
                for (const auto& a : assigns) {
                    ldefs.push_back(a);
                    ldef_lines.push_back(bst.line_no);
                }
            }
        }
        std::unordered_map<std::string, std::string> ltable;
        std::vector<std::string> lorder;
        for (const auto& d : ldefs) {
            if (!ltable.count(d.first)) lorder.push_back(d.first);
            ltable[d.first] = d.second;
        }
        std::unordered_map<std::string, double> resolved;
        for (size_t pass = 0; pass <= ltable.size(); ++pass) {
            bool progress = false, missing = false;
            for (const auto& n : lorder) {
                if (resolved.count(n)) continue;
                std::unordered_map<std::string, double> env = scope;
                for (const auto& r2 : resolved) env[r2.first] = r2.second;
                double v;
                if (eval_expr(ltable[n], env, &v)) {
                    resolved[n] = v;
                    progress = true;
                } else {
                    missing = true;
                }
            }
            if (!missing || !progress) break;
        }
        for (size_t j = 0; j < ldefs.size(); ++j) {
            if (!resolved.count(ldefs[j].first))
                warn(ldef_lines[j], st.tokens[0] + ": cannot resolve "
                     "local .PARAM " + ldefs[j].first + "='" +
                     ldefs[j].second + "'");
        }
        for (const auto& r2 : resolved) scope[r2.first] = r2.second;
        for (const auto& bst : def.body) {
            if (!bst.tokens.empty() && lower(bst.tokens[0]) == ".param")
                continue;
            expand(substitute_scoped(rename(bst, map, st.tokens[0]), scope),
                   depth + 1, scope, result);
        }
    }

    std::vector<Statement> run(const std::vector<Statement>& stmts) {
        std::vector<Statement> top0;
        collect(stmts, top0, false);
        // `.GLOBAL` cards (extension): collect the node set, drop the
        // cards (mirror of netlist/subckt.py)
        std::vector<Statement> top;
        for (auto& st : top0) {
            if (!st.tokens.empty() && lower(st.tokens[0]) == ".global") {
                for (size_t j = 1; j < st.tokens.size(); ++j)
                    global_nodes.insert(st.tokens[j]);
            } else {
                top.push_back(std::move(st));
            }
        }
        bool any_x = false;
        for (const auto& st : top)
            if (!st.tokens.empty() &&
                std::toupper((unsigned char)st.tokens[0][0]) == 'X')
                any_x = true;
        if (defs.empty() && !any_x) {
            for (auto& st : top) out.push_back(std::move(st));
            return std::move(out);
        }
        // global `.PARAM` table (mirror of resolve_params: last
        // definition wins, forward references by iteration) so instance
        // bindings and body braces see the values the parser will
        std::vector<std::pair<std::string, std::string>> gdefs;
        std::vector<std::string> gorder;
        std::unordered_map<std::string, std::string> gtable;
        for (const auto& st : top) {
            if (st.tokens.empty() || lower(st.tokens[0]) != ".param")
                continue;
            std::vector<std::string> plain;
            std::vector<std::string> tail(st.tokens.begin() + 1,
                                          st.tokens.end());
            std::vector<std::pair<std::string, std::string>> assigns;
            split_assignments(tail, st.line_no, &plain, &assigns, nullptr);
            for (const auto& a : assigns) {
                if (!gtable.count(a.first)) gorder.push_back(a.first);
                gtable[a.first] = a.second;
            }
        }
        for (size_t pass = 0; pass <= gtable.size(); ++pass) {
            bool progress = false, missing = false;
            for (const auto& n : gorder) {
                if (global_values.count(n)) continue;
                double v;
                if (eval_expr(gtable[n], global_values, &v)) {
                    global_values[n] = v;
                    progress = true;
                } else {
                    missing = true;
                }
            }
            if (!missing || !progress) break;
        }
        std::vector<Statement> result(std::move(out));
        for (const auto& st : top) expand(st, 0, global_values, result);
        return result;
    }
};

class Frontend {
public:
    Result out;
    std::unordered_map<std::string, int32_t> node_ids;
    std::unordered_map<std::string, MosModel> models;
    std::unordered_map<std::string, BjtModel> bjt_models;
    std::unordered_map<std::string, SwModel> sw_models;
    std::unordered_map<std::string, JfetModel> jfet_models;
    std::ostringstream diag;

    int32_t intern(const std::string& s) {
        int32_t off = (int32_t)out.str_pool.size();
        out.str_pool.append(s);
        out.str_pool.push_back('\0');
        return off;
    }

    int32_t node(const std::string& name) {
        auto it = node_ids.find(name);
        if (it != node_ids.end()) return it->second;
        int32_t id = (int32_t)out.nodes.size();
        NodeRec nr{intern(name), -1};
        out.nodes.push_back(nr);
        node_ids.emplace(name, id);
        return id;
    }

    void warn(int line, const std::string& msg) {
        diag << "Line " << line << ": " << msg << "\n";
    }

    // ---- lexer (contract: parser.cpp:59-135) ----
    static std::vector<Statement> lex(const std::string& text) {
        std::vector<Statement> stmts;
        std::string logical;
        int logical_start = 0;
        int line_no = 0;
        auto flush = [&]() {
            if (logical.empty()) return;
            std::string s = logical;
            size_t dollar = s.find('$');
            if (dollar != std::string::npos) s = s.substr(0, dollar);
            s = trim(s);
            logical.clear();
            if (s.empty()) return;
            Statement st;
            st.line_no = logical_start;
            st.raw = s;
            std::istringstream iss(s);
            std::string tok;
            while (iss >> tok) st.tokens.push_back(tok);
            if (!st.tokens.empty()) stmts.push_back(std::move(st));
        };
        std::istringstream in(text);
        std::string phys;
        while (std::getline(in, phys)) {
            ++line_no;
            if (!phys.empty() && phys.back() == '\r') phys.pop_back();
            size_t dollar = phys.find('$');
            if (dollar != std::string::npos) phys = phys.substr(0, dollar);
            std::string s = trim(phys);
            if (s.empty()) continue;
            if (s[0] == '*' || s[0] == ';') continue;
            if (s[0] == '+') {
                std::string rest = trim(s.substr(1));
                if (!logical.empty()) {
                    logical += " ";
                    logical += rest;
                } else {
                    logical_start = line_no;
                    logical = rest;
                }
            } else {
                flush();
                logical_start = line_no;
                logical = s;
            }
        }
        flush();
        return stmts;
    }

    // ---- element record helpers ----
    ElementRec blank(int kind, const std::string& name) {
        ElementRec e{};
        e.kind = kind;
        e.name_off = intern(name);
        e.nodes[0] = e.nodes[1] = e.nodes[2] = e.nodes[3] = -1;
        e.branch_eq = -1;
        e.n_ideal = 1.0;
        e.pwl_off = -1;
        e.ctrl_off = -1;
        e.ctrl2_off = -1;
        e.af = 1.0;
        e.tn_alpha = 1.0;
        e.ron = 1.0;
        e.roff = 1e12;
        e.z0 = 50.0;
        e.phi = 0.6;
        e.branch_eq2 = -1;
        e.bexpr_off = -1;
        e.b_is_v = 1;
        return e;
    }

    bool parse_or_warn(const Statement& st, const std::string& tok,
                       const char* what, double* out_val) {
        if (parse_spice(tok, out_val)) return true;
        warn(st.line_no, std::string("cannot parse ") + what + ": '" +
                              st.raw + "'");
        return false;
    }

    // ---- devices ----
    void dev_rcl(const Statement& st, int kind) {
        if (st.tokens.size() < 4) {
            warn(st.line_no, "invalid element: " + st.raw);
            return;
        }
        double v;
        if (!parse_or_warn(st, st.tokens[3], "value", &v)) return;
        ElementRec e = blank(kind, st.tokens[0]);
        e.nodes[0] = node(st.tokens[1]);
        e.nodes[1] = node(st.tokens[2]);
        e.value = v;
        double mult = 1.0;
        {
            // trailing key=value specs: TC (R only), DEV=/LOT= Monte-Carlo
            // tolerances (R/C/L; `5%` or bare fraction) — extensions
            bool bad = false;
            auto tolv = [&](std::string s, double* out_v) {
                if (!s.empty() && s.back() == '%') {
                    if (!parse_spice(s.substr(0, s.size() - 1), out_v))
                        return false;
                    *out_v /= 100.0;
                    return true;
                }
                return parse_spice(s, out_v);
            };
            for (size_t i = 4; i < st.tokens.size(); ++i) {
                std::string low = lower(st.tokens[i]);
                if (kind == 0 && low.rfind("tc=", 0) == 0) {
                    std::string rest = low.substr(3);
                    size_t comma = rest.find(',');
                    std::string a = rest.substr(0, comma);
                    if (!parse_spice(a, &e.tc1)) bad = true;
                    if (comma != std::string::npos &&
                        comma + 1 < rest.size()) {
                        if (!parse_spice(rest.substr(comma + 1), &e.tc2))
                            bad = true;
                    }
                } else if (kind == 0 && low.rfind("tc1=", 0) == 0) {
                    if (!parse_spice(low.substr(4), &e.tc1)) bad = true;
                } else if (kind == 0 && low.rfind("tc2=", 0) == 0) {
                    if (!parse_spice(low.substr(4), &e.tc2)) bad = true;
                } else if (low.rfind("dev=", 0) == 0) {
                    if (!tolv(low.substr(4), &e.dev_tol)) bad = true;
                } else if (low.rfind("lot=", 0) == 0) {
                    if (!tolv(low.substr(4), &e.lot_tol)) bad = true;
                } else if (kind != 0 && low.rfind("ic=", 0) == 0) {
                    // initial cap voltage / inductor current (UIC only)
                    if (!parse_spice(low.substr(3), &e.ic)) bad = true;
                    else e.has_ic = 1;
                } else if (low.rfind("m=", 0) == 0) {
                    // parallel-multiplicity factor (extension)
                    if (!parse_spice(low.substr(2), &mult)) bad = true;
                }
            }
            if (bad) {
                warn(st.line_no, std::string("cannot parse ") +
                                     "RCL"[kind] + " key=value spec: '" +
                                     st.raw + "'");
                e.tc1 = e.tc2 = e.dev_tol = e.lot_tol = 0.0;
                e.ic = 0.0;
                e.has_ic = 0;
                mult = 1.0;
            }
        }
        if (mult <= 0) {
            warn(st.line_no, "M= multiplier must be > 0: " + st.raw);
            mult = 1.0;
        }
        // R/L divide (parallel), C multiplies — mirror of _parse_rcl
        e.value = (kind == 1) ? v * mult : v / mult;
        out.elements.push_back(e);
    }

    void parse_waveform(const Statement& st, ElementRec& e, size_t from) {
        const auto& t = st.tokens;
        for (size_t j = from; j < t.size(); ++j) {
            std::string head = lower(t[j]);
            if (head == "sin") {
                if (t.size() < j + 4) {
                    warn(st.line_no,
                         "SIN needs at least 3 parameters (v0 va freq): " +
                             st.raw);
                    return;
                }
                double p[5] = {0, 0, 0, 0, 0};
                size_t avail = std::min<size_t>(5, t.size() - j - 1);
                size_t got = 0;
                for (size_t i = 0; i < avail; ++i) {
                    // optional args stop at a trailing spec keyword
                    // (TRNOISE(...), AC, DC, DEV=, LOT=) — matching the
                    // Python frontend: 'SIN 1 0.6 9e8 0 TRNOISE(1m 0)'
                    // keeps the SIN and hands TRNOISE to its own parser
                    std::string low = lower(t[j + 1 + i]);
                    if (low.rfind("trnoise", 0) == 0 ||
                        low.rfind("dev", 0) == 0 ||
                        low.rfind("lot", 0) == 0 ||
                        low == "ac" || low == "dc")
                        break;
                    if (!parse_spice(t[j + 1 + i], &p[i])) {
                        // any unparseable parameter aborts the whole
                        // waveform, matching the Python frontend
                        warn(st.line_no,
                             "cannot parse SIN parameters: " + st.raw);
                        return;
                    }
                    ++got;
                }
                if (got < 3) {
                    warn(st.line_no,
                         "SIN needs at least 3 parameters (v0 va freq): " +
                             st.raw);
                    return;
                }
                e.wave_kind = 2;
                for (int i = 0; i < 5; ++i) e.sin5[i] = p[i];
                return;
            }
            if (head.rfind("pulse", 0) == 0) {
                std::vector<double> vals;
                std::string first = head.size() > 5 ? head.substr(5) : "";
                auto push_tok = [&](std::string a) {
                    a.erase(std::remove_if(a.begin(), a.end(),
                                           [](char c) {
                                               return c == '(' || c == ')';
                                           }),
                            a.end());
                    if (a.empty()) return true;
                    double v;
                    if (!parse_spice(a, &v)) return false;
                    vals.push_back(v);
                    return true;
                };
                push_tok(first);
                for (size_t i = j + 1; i < t.size(); ++i)
                    if (!push_tok(t[i])) break;
                if (vals.size() < 2) {
                    warn(st.line_no, "PULSE needs at least v1 v2: " + st.raw);
                    return;
                }
                e.wave_kind = 1;
                for (size_t i = 0; i < vals.size() && i < 7; ++i)
                    e.pulse[i] = vals[i];
                return;
            }
            if (head.rfind("pwl", 0) == 0) {
                std::vector<double> vals;
                std::string first = head.size() > 3 ? head.substr(3) : "";
                bool ok = true;
                auto push_tok = [&](std::string a) {
                    std::replace(a.begin(), a.end(), '(', ' ');
                    std::replace(a.begin(), a.end(), ')', ' ');
                    std::istringstream iss(a);
                    std::string piece;
                    while (iss >> piece) {
                        double v;
                        if (!parse_spice(piece, &v)) { ok = false; return; }
                        vals.push_back(v);
                    }
                };
                push_tok(first);
                for (size_t i = j + 1; i < t.size() && ok; ++i)
                    push_tok(t[i]);
                if (!ok) {
                    warn(st.line_no, "cannot parse PWL point: " + st.raw);
                    return;
                }
                if (vals.size() < 2 || vals.size() % 2) {
                    warn(st.line_no, "PWL needs (t, v) pairs: " + st.raw);
                    return;
                }
                e.wave_kind = 3;
                e.pwl_off = (int32_t)out.pwl_pool.size();
                e.pwl_n = (int32_t)(vals.size() / 2);
                out.pwl_pool.insert(out.pwl_pool.end(), vals.begin(),
                                    vals.end());
                return;
            }
            // EXP(v1 v2 [td1 tau1 td2 tau2]) / SFFM(vo va fc [mdi fs]) —
            // extensions, packed into the PULSE / SIN field blocks exactly
            // as in the Python frontend (netlist/circuit.py WAVE_EXP/SFFM)
            bool is_exp = head.rfind("exp", 0) == 0;
            bool is_sffm = head.rfind("sffm", 0) == 0;
            if (is_exp || is_sffm) {
                size_t kwlen = is_exp ? 3 : 4;
                std::vector<double> vals;
                std::string first =
                    head.size() > kwlen ? head.substr(kwlen) : "";
                auto push_tok = [&](std::string a) {
                    a.erase(std::remove_if(a.begin(), a.end(),
                                           [](char c) {
                                               return c == '(' || c == ')';
                                           }),
                            a.end());
                    if (a.empty()) return true;
                    double v;
                    if (!parse_spice(a, &v)) return false;
                    vals.push_back(v);
                    return true;
                };
                push_tok(first);
                for (size_t i = j + 1; i < t.size(); ++i)
                    if (!push_tok(t[i])) break;
                if (is_exp) {
                    if (vals.size() < 2) {
                        warn(st.line_no,
                             "EXP needs at least v1 v2: " + st.raw);
                        return;
                    }
                    e.wave_kind = 4;
                    // no td2 given => no decay segment (td2 = +inf)
                    e.pulse[4] = std::numeric_limits<double>::infinity();
                    for (size_t i = 0; i < vals.size() && i < 6; ++i)
                        e.pulse[i] = vals[i];
                } else {
                    if (vals.size() < 3) {
                        warn(st.line_no,
                             "SFFM needs at least vo va fc: " + st.raw);
                        return;
                    }
                    e.wave_kind = 5;
                    for (size_t i = 0; i < vals.size() && i < 5; ++i)
                        e.sin5[i] = vals[i];
                }
                return;
            }
        }
    }

    void parse_trnoise(const Statement& st, ElementRec& e, size_t from) {
        // TRNOISE(na [nt]) anywhere after the source value (extension):
        // white Gaussian transient noise, RMS na, hold interval nt
        // (mirror of netlist/parser.py _parse_trnoise)
        const auto& t = st.tokens;
        for (size_t j = from; j < t.size(); ++j) {
            std::string head = lower(t[j]);
            if (head.rfind("trnoise", 0) != 0) continue;
            std::vector<double> vals;
            std::string first = head.size() > 7 ? head.substr(7) : "";
            auto push_tok = [&](std::string a) {
                a.erase(std::remove_if(a.begin(), a.end(),
                                       [](char c) {
                                           return c == '(' || c == ')';
                                       }),
                        a.end());
                if (a.empty()) return true;
                double v;
                if (!parse_spice(a, &v)) return false;
                vals.push_back(v);
                return true;
            };
            push_tok(first);
            for (size_t i = j + 1; i < t.size(); ++i)
                if (!push_tok(t[i])) break;
            if (vals.empty()) {
                warn(st.line_no, "TRNOISE needs an amplitude: " + st.raw);
                return;
            }
            e.tn_na = vals[0];
            if (vals.size() > 1) e.tn_nt = vals[1];
            if (vals.size() > 2 && vals[2] > 0) e.tn_alpha = vals[2];
            if (vals.size() > 3) e.tn_namp = vals[3];
            return;
        }
    }

    void parse_ac_spec(const Statement& st, ElementRec& e) {
        const auto& t = st.tokens;
        for (size_t i = 3; i + 1 < t.size(); ++i) {
            if (lower(t[i]) == "ac") {
                double mag;
                if (!parse_spice(t[i + 1], &mag)) {
                    warn(st.line_no, "cannot parse AC spec: " + st.raw);
                    return;
                }
                e.ac_mag = mag;
                if (i + 2 < t.size()) {
                    double ph;
                    if (parse_spice(t[i + 2], &ph)) e.ac_phase = ph;
                }
                return;
            }
        }
    }

    void dev_vsource(const Statement& st) {
        const auto& t = st.tokens;
        if (t.size() < 4) {
            warn(st.line_no, "invalid voltage source: " + st.raw);
            return;
        }
        ElementRec e = blank(3, t[0]);
        size_t idx = 3;
        std::string low3 = lower(t[3]);
        if (t.size() >= 5 && low3 == "dc") {
            if (!parse_or_warn(st, t[4], "V DC value", &e.dc)) return;
            idx = 5;
        } else if (low3 == "sin" || low3 == "ac" ||
                   low3.rfind("pulse", 0) == 0 || low3.rfind("pwl", 0) == 0 ||
                   low3.rfind("exp", 0) == 0 || low3.rfind("sffm", 0) == 0 ||
                   low3.rfind("trnoise", 0) == 0) {
            e.dc = 0.0;
            idx = 3;
        } else {
            if (!parse_or_warn(st, t[3], "V DC value", &e.dc)) return;
            idx = 4;
        }
        parse_waveform(st, e, idx);
        parse_ac_spec(st, e);
        parse_trnoise(st, e, idx);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        out.elements.push_back(e);
    }

    void dev_isource(const Statement& st) {
        const auto& t = st.tokens;
        if (t.size() < 4) {
            warn(st.line_no, "invalid current source: " + st.raw);
            return;
        }
        // reference grammar: no waveforms on I sources (parser.cpp:358-379);
        // SIN/PULSE/PWL accepted as an extension, like the V-source forms
        ElementRec e = blank(4, t[0]);
        size_t idx = 3;
        std::string low3 = lower(t[3]);
        if (t.size() >= 5 && low3 == "dc") {
            if (!parse_or_warn(st, t[4], "I value", &e.dc)) return;
            idx = 5;
        } else if (low3 == "sin" || low3 == "ac" ||
                   low3.rfind("pulse", 0) == 0 || low3.rfind("pwl", 0) == 0 ||
                   low3.rfind("exp", 0) == 0 || low3.rfind("sffm", 0) == 0 ||
                   low3.rfind("trnoise", 0) == 0) {
            e.dc = 0.0;
            idx = 3;
        } else {
            if (!parse_or_warn(st, t[3], "I value", &e.dc)) return;
            idx = 4;
        }
        parse_waveform(st, e, idx);
        parse_ac_spec(st, e);
        parse_trnoise(st, e, idx);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        out.elements.push_back(e);
    }

    void dev_mosfet(const Statement& st) {
        const auto& t = st.tokens;
        // standard-SPICE form (extension): `M d g s b model W=.. L=..` —
        // detected by any KEY=VALUE token (mirror of _parse_mosfet)
        bool kv = false;
        for (size_t i = 4; i < t.size(); ++i)
            kv = kv || t[i].find('=') != std::string::npos;
        std::string model_id;
        double w = 0, l = 0, mc_dev = 0, mc_lot = 0, mult = 1.0;
        if (kv) {
            if (t.size() < 6) {
                warn(st.line_no, "invalid MOSFET: " + st.raw);
                return;
            }
            model_id = t[5];              // after the bulk node
            bool has_w = false, has_l = false;
            for (size_t i = 6; i < t.size(); ++i) {
                size_t eq = t[i].find('=');
                std::string key = eq == std::string::npos
                                      ? t[i] : lower(t[i].substr(0, eq));
                std::string val = eq == std::string::npos
                                      ? "" : t[i].substr(eq + 1);
                if (key == "w" && !val.empty()) {
                    if (!parse_or_warn(st, val, "MOS param", &w)) return;
                    has_w = true;
                } else if (key == "l" && !val.empty()) {
                    if (!parse_or_warn(st, val, "MOS param", &l)) return;
                    has_l = true;
                } else if (key == "dev" && !val.empty()) {
                    // VT mismatch tolerance (netlist Monte-Carlo)
                    if (!tol_value(val, &mc_dev)) {
                        warn(st.line_no,
                             "cannot parse MOS param " + t[i]);
                        return;
                    }
                } else if (key == "lot" && !val.empty()) {
                    if (!tol_value(val, &mc_lot)) {
                        warn(st.line_no,
                             "cannot parse MOS param " + t[i]);
                        return;
                    }
                } else if (key == "m" && !val.empty()) {
                    // parallel devices (extension)
                    if (!parse_spice(val, &mult)) {
                        warn(st.line_no,
                             "cannot parse MOS param " + t[i]);
                        return;
                    }
                } else {
                    warn(st.line_no, "unknown MOS param '" + t[i] +
                                         "' (W=/L= supported)");
                }
            }
            if (!has_w || !has_l) {
                warn(st.line_no, "MOS W=/L= missing: " + st.raw);
                return;
            }
        } else {
            // 7-token: M name d g s model W L; 8-token: the p/n token is
            // ignored and the trailing token is the model id
            if (t.size() != 7 && t.size() != 8) {
                warn(st.line_no, "invalid MOSFET: " + st.raw);
                return;
            }
            model_id = (t.size() == 7) ? t[4] : t.back();
            if (!parse_or_warn(st, t[5], "MOS W", &w)) return;
            if (!parse_or_warn(st, t[6], "MOS L", &l)) return;
        }
        auto it = models.find(model_id);
        if (it == models.end()) {
            diag << "Unknown MOS model: " << model_id << "\n";
            return;  // model check precedes node creation (circuit.cpp:133-137)
        }
        if (mult <= 0) {
            warn(st.line_no, "M= multiplier must be > 0: " + st.raw);
            mult = 1.0;
        }
        const MosModel& m = it->second;
        ElementRec e = blank(5, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        e.nodes[2] = node(t[3]);
        e.nodes[3] = node("0");  // bulk forced to ground (circuit.cpp:142)
        e.is_p = m.is_p ? 1 : 0;
        e.vth = std::fabs(m.vt);
        e.k = m.mu * m.cox * (w / l) * mult;
        e.coxwl = m.cox * w * l * mult;
        e.lam = m.lambda_;
        e.cj0 = m.cj0 * mult;
        e.kf = m.kf;
        e.af = m.af;
        e.gamma = m.gamma;
        e.phi = m.phi;
        e.dev_tol = mc_dev;
        e.lot_tol = mc_lot;
        out.elements.push_back(e);
    }

    // optional trailing DEV=/LOT= Monte-Carlo tolerances and M= parallel
    // multiplicity (mirror of NetlistParser._tail_tols)
    void tail_tols(const Statement& st, size_t from,
                   const std::string& label, double* dev, double* lot,
                   double* mult) {
        const auto& t = st.tokens;
        *mult = 1.0;
        for (size_t i = from; i < t.size(); ++i) {
            size_t eq = t[i].find('=');
            std::string key = eq == std::string::npos
                                  ? t[i] : lower(t[i].substr(0, eq));
            std::string val = eq == std::string::npos
                                  ? "" : t[i].substr(eq + 1);
            if (key == "dev" && !val.empty()) {
                if (!tol_value(val, dev))
                    warn(st.line_no,
                         "cannot parse " + label + " param " + t[i]);
            } else if (key == "lot" && !val.empty()) {
                if (!tol_value(val, lot))
                    warn(st.line_no,
                         "cannot parse " + label + " param " + t[i]);
            } else if (key == "m" && !val.empty()) {
                if (!parse_spice(val, mult))
                    warn(st.line_no,
                         "cannot parse " + label + " param " + t[i]);
            } else {
                warn(st.line_no,
                     "unknown " + label + " param '" + t[i] + "'");
            }
        }
        if (*mult <= 0) {
            warn(st.line_no, "M= multiplier must be > 0: " + st.raw);
            *mult = 1.0;
        }
    }

    void dev_bjt(const Statement& st) {
        // Q name nc nb ne model [DEV=|LOT=] (extension; no BJT in the
        // reference; DEV/LOT = BF mismatch for Monte-Carlo)
        const auto& t = st.tokens;
        if (t.size() < 5) {
            warn(st.line_no, "invalid BJT: " + st.raw);
            return;
        }
        auto it = bjt_models.find(t[4]);
        if (it == bjt_models.end()) {
            diag << "Unknown BJT model: " << t[4] << "\n";
            return;
        }
        const BjtModel& m = it->second;
        ElementRec e = blank(7, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        e.nodes[2] = node(t[3]);
        double mult;
        tail_tols(st, 5, "BJT", &e.dev_tol, &e.lot_tol, &mult);
        e.is_p = m.is_pnp ? 1 : 0;
        e.i_sat = m.i_sat * mult;   // M parallel devices (extension)
        e.bf = m.bf;
        e.br = m.br;
        e.vaf = m.vaf;
        e.cje = m.cje * mult;
        e.cjc = m.cjc * mult;
        e.eg = m.eg;
        e.xti = m.xti;
        out.elements.push_back(e);
    }

    // SPICE2 POLY expression text from raw coefficient tokens; must build
    // the IDENTICAL string as NetlistParser._poly_expr
    static std::string poly_expr(const std::vector<std::string>& vars,
                                 const std::vector<std::string>& coeffs) {
        size_t n = vars.size();
        if (n == 1 && coeffs.size() == 1)
            return coeffs[0] + "*" + vars[0];
        std::vector<std::string> terms;
        size_t idx = 0;
        if (!coeffs.empty()) {
            terms.push_back(coeffs[0]);
            idx = 1;
        }
        for (const auto& v : vars) {
            if (idx >= coeffs.size()) break;
            terms.push_back(coeffs[idx] + "*" + v);
            ++idx;
        }
        if (n == 1) {
            size_t k = 2;
            while (idx < coeffs.size()) {
                terms.push_back(coeffs[idx] + "*" + vars[0] + "**" +
                                std::to_string(k));
                ++idx;
                ++k;
            }
        } else {
            for (size_t i = 0; i < n; ++i) {
                for (size_t j = i; j < n; ++j) {
                    if (idx >= coeffs.size()) break;
                    std::string prod = i == j ? vars[i] + "**2"
                                              : vars[i] + "*" + vars[j];
                    terms.push_back(coeffs[idx] + "*" + prod);
                    ++idx;
                }
            }
        }
        if (terms.empty()) return "0";
        std::string out;
        for (const auto& s2 : terms) {
            if (!out.empty()) out += " + ";
            out += s2;
        }
        return out;
    }

    void dev_poly(const Statement& st, int kind, long n_poly) {
        // POLY(n) E/G/F/H lowered to a behavioral source (kind 17);
        // mirror of NetlistParser._parse_poly
        const auto& t = st.tokens;
        bool vctl = kind == 8 || kind == 9;
        size_t n_ctl = vctl ? 2 * (size_t)n_poly : (size_t)n_poly;
        size_t first = 4 + n_ctl;
        if (n_poly < 1 || t.size() < first + 1) {
            warn(st.line_no, "invalid POLY source: " + st.raw);
            return;
        }
        std::vector<std::string> vars;
        for (long i = 0; i < n_poly; ++i) {
            if (vctl)
                vars.push_back("v(" + t[4 + 2 * i] + "," + t[4 + 2 * i + 1]
                               + ")");
            else
                vars.push_back("i(" + t[4 + i] + ")");
        }
        std::vector<std::string> coeffs(t.begin() + first, t.end());
        for (const auto& c : coeffs) {
            double d;
            if (!parse_spice(c, &d)) {
                warn(st.line_no,
                     "cannot parse POLY coefficient '" + c + "'");
                return;
            }
        }
        ElementRec e = blank(17, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        e.bexpr_off = intern(poly_expr(vars, coeffs));
        e.b_is_v = (kind == 8 || kind == 11) ? 1 : 0;   // E/H forms
        out.elements.push_back(e);
    }

    void dev_ctrl(const Statement& st, int kind) {
        // E/G np nm ncp ncm gain ; F/H np nm Vctrl gain (extensions);
        // the SPICE2 POLY(n) form routes to dev_poly
        const auto& t = st.tokens;
        if (t.size() > 3) {
            std::string p3 = lower(t[3]);
            if (p3.rfind("poly(", 0) == 0 && p3.back() == ')') {
                char* e2 = nullptr;
                long n = std::strtol(p3.c_str() + 5, &e2, 10);
                if (e2 && *e2 == ')') {
                    dev_poly(st, kind, n);
                    return;
                }
            }
        }
        bool vctl = kind == 8 || kind == 9;
        size_t need = vctl ? 6 : 5;
        if (t.size() < need) {
            warn(st.line_no, "invalid controlled source: " + st.raw);
            return;
        }
        double val;
        if (!parse_spice(t[need - 1], &val)) {
            warn(st.line_no, "cannot parse controlled-source value: " + st.raw);
            return;
        }
        ElementRec e = blank(kind, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        if (vctl) {
            e.nodes[2] = node(t[3]);
            e.nodes[3] = node(t[4]);
        } else {
            e.ctrl_off = intern(t[3]);
        }
        e.value = val;
        out.elements.push_back(e);
    }

    void dev_bsource(const Statement& st) {
        // B np nm V=expr | I=expr (mirror of _parse_bsource; expression
        // validation happens in the Python lowering — the frontend only
        // carries the text)
        const auto& t = st.tokens;
        if (t.size() < 4) {
            warn(st.line_no, "invalid behavioral source: " + st.raw);
            return;
        }
        std::string text;
        for (size_t i = 3; i < t.size(); ++i) {
            if (!text.empty()) text += " ";
            text += t[i];
        }
        std::string norm;
        for (size_t i = 0; i < text.size(); ++i) {
            if (text[i] == ' ' &&
                ((i + 1 < text.size() && text[i + 1] == '=') ||
                 (!norm.empty() && norm.back() == '='))) continue;
            norm += text[i];
        }
        char c0 = norm.empty() ? 0 : (char)std::tolower((unsigned char)norm[0]);
        bool is_v;
        if (norm.size() > 2 && c0 == 'v' && norm[1] == '=') {
            is_v = true;
        } else if (norm.size() > 2 && c0 == 'i' && norm[1] == '=') {
            is_v = false;
        } else {
            warn(st.line_no,
                 "behavioral source needs V=expr or I=expr: " + st.raw);
            return;
        }
        std::string expr = norm.substr(2);
        while (!expr.empty() && std::isspace((unsigned char)expr.front()))
            expr.erase(expr.begin());
        while (!expr.empty() && std::isspace((unsigned char)expr.back()))
            expr.pop_back();
        if (expr.empty()) {
            warn(st.line_no, "empty behavioral expression: " + st.raw);
            return;
        }
        if (!validate_behavioral_expr(expr)) {
            // same outcome as the Python frontend: warn and drop, so both
            // frontends build the same circuit from a broken expression
            warn(st.line_no,
                 "cannot parse behavioral expression: " + st.raw);
            return;
        }
        ElementRec e = blank(17, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        e.bexpr_off = intern(expr);
        e.b_is_v = is_v ? 1 : 0;
        out.elements.push_back(e);
    }

    void dev_tline(const Statement& st) {
        // T p1 n1 p2 n2 Z0= TD= | Z0= F= [NL=]  (mirror of _parse_tline)
        const auto& t = st.tokens;
        if (t.size() < 6) {
            warn(st.line_no, "invalid transmission line: " + st.raw);
            return;
        }
        std::string text;
        for (size_t i = 5; i < t.size(); ++i) {
            if (!text.empty()) text += " ";
            text += t[i];
        }
        std::string norm;
        for (size_t i = 0; i < text.size(); ++i) {
            if (text[i] == ' ' &&
                ((i + 1 < text.size() && text[i + 1] == '=') ||
                 (!norm.empty() && norm.back() == '='))) continue;
            norm += text[i];
        }
        double z0 = 50.0, td = -1.0, freq = 0.0, nl = 0.25;
        bool has_td = false;
        std::istringstream iss(norm);
        std::string tok;
        while (iss >> tok) {
            size_t eq = tok.find('=');
            if (eq == std::string::npos) {
                warn(st.line_no, "invalid T-line param: '" + tok + "'");
                continue;
            }
            std::string k = lower(tok.substr(0, eq));
            double v;
            if (!parse_spice(tok.substr(eq + 1), &v)) {
                warn(st.line_no, "cannot parse T-line param " + tok);
                return;
            }
            if (k == "z0") z0 = v;
            else if (k == "td") { td = v; has_td = true; }
            else if (k == "f") freq = v;
            else if (k == "nl") nl = v;
            else warn(st.line_no, "unknown T-line param '" + k + "'");
        }
        if (!has_td) {
            if (freq == 0.0) {
                warn(st.line_no, "T-line needs TD= or F=: " + st.raw);
                return;
            }
            td = nl / freq;
        }
        if (td <= 0 || z0 <= 0) {
            warn(st.line_no, "T-line needs positive Z0/TD: " + st.raw);
            return;
        }
        ElementRec e = blank(16, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        e.nodes[2] = node(t[3]);
        e.nodes[3] = node(t[4]);
        e.z0 = z0;
        e.td = td;
        out.elements.push_back(e);
    }

    void dev_jfet(const Statement& st) {
        // J nd ng ns model (extension; mirror of add_jfet: signed VTO in
        // vth, BETA in k, LAMBDA in lam)
        const auto& t = st.tokens;
        if (t.size() < 5) {
            warn(st.line_no, "invalid JFET: " + st.raw);
            return;
        }
        auto it = jfet_models.find(t[4]);
        if (it == jfet_models.end()) {
            diag << "Unknown JFET model: " << t[4] << "\n";
            return;
        }
        const JfetModel& m = it->second;
        ElementRec e = blank(15, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        e.nodes[2] = node(t[3]);
        double mult;
        tail_tols(st, 5, "JFET", &e.dev_tol, &e.lot_tol, &mult);
        e.is_p = m.is_p ? 1 : 0;
        e.vth = m.vto;
        e.k = m.beta * mult;        // M parallel devices (extension)
        e.lam = m.lambda_;
        out.elements.push_back(e);
    }

    void dev_switch(const Statement& st, char c0) {
        // S np nm ncp ncm model [ON|OFF] / W np nm Vctrl model [ON|OFF]
        // (extension; mirror of _parse_switch — ON/OFF accepted, ignored)
        const auto& t = st.tokens;
        size_t need = c0 == 'S' ? 6 : 5;
        if (t.size() < need) {
            warn(st.line_no, std::string("invalid ") + c0 + "-switch: "
                                 + st.raw);
            return;
        }
        if (t.size() > need) {
            std::string trail = lower(t[need]);
            if (trail != "on" && trail != "off")
                warn(st.line_no, std::string("unexpected trailing token '") +
                                     t[need] + "' on " + c0 + "-switch");
        }
        const std::string& model_id = t[need - 1];
        auto it = sw_models.find(model_id);
        if (it == sw_models.end()) {
            diag << "Unknown switch model: " << model_id << "\n";
            return;
        }
        const SwModel& m = it->second;
        ElementRec e = blank(c0 == 'S' ? 13 : 14, t[0]);
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        if (c0 == 'S') {
            e.nodes[2] = node(t[3]);
            e.nodes[3] = node(t[4]);
        } else {
            e.ctrl_off = intern(t[3]);
        }
        e.ron = m.ron;
        e.roff = m.roff;
        e.s_vt = m.vt;
        e.s_vh = m.vh;
        out.elements.push_back(e);
    }

    void dev_mutual(const Statement& st) {
        // K name L1 L2 k (extension): mirror of _parse_mutual
        const auto& t = st.tokens;
        if (t.size() < 4) {
            warn(st.line_no, "invalid mutual inductance: " + st.raw);
            return;
        }
        double k;
        if (!parse_spice(t[3], &k)) {
            warn(st.line_no,
                 "cannot parse coupling coefficient: " + st.raw);
            return;
        }
        if (std::fabs(k) > 1.0) {
            warn(st.line_no, "coupling |k| > 1 in '" + st.raw +
                                 "'; clamping");
            k = k > 0 ? 1.0 : -1.0;
        }
        ElementRec e = blank(12, t[0]);
        e.ctrl_off = intern(t[1]);
        e.ctrl2_off = intern(t[2]);
        e.value = k;
        out.elements.push_back(e);
    }

    void dev_diode(const Statement& st) {
        const auto& t = st.tokens;
        if (t.size() < 3) {
            warn(st.line_no, "invalid diode: " + st.raw);
            return;
        }
        ElementRec e = blank(6, t[0]);
        e.i_sat = 1e-14;
        e.n_ideal = 1.0;
        e.d_ibv = 1e-3;
        double mult = 1.0;
        for (size_t i = 3; i < t.size(); ++i) {
            std::string tok = t[i];
            size_t eq = tok.find('=');
            if (eq == std::string::npos) continue;
            std::string key = lower(tok.substr(0, eq));
            if (key == "m") {
                // parallel diodes (extension)
                if (!parse_spice(tok.substr(eq + 1), &mult)) {
                    warn(st.line_no, "cannot parse diode param: " + st.raw);
                    return;
                }
                continue;
            }
            if (key == "dev" || key == "lot") {
                // IS mismatch tolerance (netlist Monte-Carlo; `5%` ok)
                double tv;
                if (!tol_value(tok.substr(eq + 1), &tv)) {
                    warn(st.line_no, "cannot parse diode param: " + st.raw);
                    return;
                }
                (key == "dev" ? e.dev_tol : e.lot_tol) = tv;
                continue;
            }
            double v;
            if (!parse_spice(tok.substr(eq + 1), &v)) {
                warn(st.line_no, "cannot parse diode param: " + st.raw);
                return;
            }
            if (key == "is") e.i_sat = v;
            else if (key == "n") e.n_ideal = v;
            else if (key == "cjo" || key == "cj0") e.cj0 = v;
            else if (key == "bv") e.d_bv = v;
            else if (key == "ibv") e.d_ibv = v;
            else if (key == "eg") e.eg = v;
            else if (key == "xti") e.xti = v;
        }
        if (mult <= 0) {
            warn(st.line_no, "M= multiplier must be > 0: " + st.raw);
            mult = 1.0;
        }
        // M parallel diodes: current-carrying params scale (mirror of
        // _parse_diode — IS, CJO, IBV)
        e.i_sat *= mult;
        e.cj0 *= mult;
        e.d_ibv *= mult;
        e.nodes[0] = node(t[1]);
        e.nodes[1] = node(t[2]);
        out.elements.push_back(e);
    }

    // ---- dot cards ----
    void card_bjt_model(const Statement& st) {
        const auto& t = st.tokens;
        BjtModel m;
        m.is_pnp = lower(t[2]) == "pnp";
        std::vector<std::string> args;
        for (size_t i = 3; i < t.size(); ++i) {
            const std::string& tok = t[i];
            size_t eq = tok.find('=');
            if (eq == std::string::npos) {
                args.push_back(tok);
            } else {
                args.push_back(tok.substr(0, eq));
                args.push_back(tok.substr(eq + 1));
            }
        }
        for (size_t i = 0; i + 1 < args.size(); i += 2) {
            std::string key = lower(args[i]);
            double v;
            if (!parse_spice(args[i + 1], &v)) {
                warn(st.line_no, "cannot parse .MODEL param " + key);
                return;
            }
            if (key == "is") m.i_sat = v;
            else if (key == "bf") m.bf = v;
            else if (key == "br") m.br = v;
            else if (key == "vaf") m.vaf = v;
            else if (key == "cje") m.cje = v;
            else if (key == "cjc") m.cjc = v;
            else if (key == "eg") m.eg = v;
            else if (key == "xti") m.xti = v;
        }
        bjt_models[t[1]] = m;
    }

    void card_jfet_model(const Statement& st) {
        // .MODEL id NJF|PJF [VTO=] [BETA=] [LAMBDA=] (extension)
        const auto& t = st.tokens;
        JfetModel m;
        std::string h2 = lower(t[2]);
        m.is_p = h2.substr(0, h2.find('(')) == "pjf";
        std::string text;
        for (size_t i = 2; i < t.size(); ++i) {
            if (!text.empty()) text += " ";
            text += t[i];
        }
        for (auto& c : text)
            if (c == '(' || c == ')') c = ' ';
        std::string norm;
        for (size_t i = 0; i < text.size(); ++i) {
            if (text[i] == ' ' &&
                ((i + 1 < text.size() && text[i + 1] == '=') ||
                 (!norm.empty() && norm.back() == '='))) continue;
            norm += text[i];
        }
        std::istringstream iss(norm);
        std::string tok;
        while (iss >> tok) {
            std::string lowtok = lower(tok);
            if (lowtok == "njf" || lowtok == "pjf") continue;
            size_t eq = tok.find('=');
            if (eq == std::string::npos) {
                warn(st.line_no, "invalid JFET model param: '" + tok + "'");
                continue;
            }
            std::string k = lower(tok.substr(0, eq));
            double v;
            if (!parse_spice(tok.substr(eq + 1), &v)) {
                warn(st.line_no, "cannot parse .MODEL param " + tok);
                return;
            }
            if (k == "vto") m.vto = v;
            else if (k == "beta") m.beta = v;
            else if (k == "lambda") m.lambda_ = v;
            else warn(st.line_no, "unknown JFET model param '" + k + "'");
        }
        jfet_models[t[1]] = m;
    }

    void card_sw_model(const Statement& st) {
        // .MODEL id SW|CSW [RON=] [ROFF=] [VT=|IT=] [VH=|IH=]; mirror of
        // NetlistParser._parse_sw_model_card
        const auto& t = st.tokens;
        SwModel m;
        std::string text;
        for (size_t i = 2; i < t.size(); ++i) {
            if (!text.empty()) text += " ";
            text += t[i];
        }
        for (auto& c : text)
            if (c == '(' || c == ')') c = ' ';
        std::string norm;
        for (size_t i = 0; i < text.size(); ++i) {
            if (text[i] == ' ' &&
                ((i + 1 < text.size() && text[i + 1] == '=') ||
                 (!norm.empty() && norm.back() == '='))) continue;
            norm += text[i];
        }
        std::istringstream iss(norm);
        std::string tok;
        while (iss >> tok) {
            std::string low = lower(tok);
            if (low == "sw" || low == "csw") continue;
            size_t eq = low.find('=');
            if (eq == std::string::npos) {
                warn(st.line_no, "invalid switch model param: '" + tok + "'");
                continue;
            }
            std::string k = low.substr(0, eq);
            double v;
            if (!parse_spice(low.substr(eq + 1), &v)) {
                warn(st.line_no, "cannot parse .MODEL param " + tok);
                return;
            }
            if (k == "ron") m.ron = v;
            else if (k == "roff") m.roff = v;
            else if (k == "vt" || k == "it") m.vt = v;
            else if (k == "vh" || k == "ih") m.vh = std::fabs(v);
            else warn(st.line_no, "unknown switch model param '" + k + "'");
        }
        sw_models[t[1]] = m;
    }

    void card_model(const Statement& st) {
        const auto& t = st.tokens;
        if (t.size() >= 3 &&
            (lower(t[2]) == "npn" || lower(t[2]) == "pnp")) {
            card_bjt_model(st);
            return;
        }
        if (t.size() >= 3) {
            std::string head2 = lower(t[2]);
            head2 = head2.substr(0, head2.find('('));
            if (head2 == "sw" || head2 == "csw") {
                card_sw_model(st);
                return;
            }
            if (head2 == "njf" || head2 == "pjf") {
                card_jfet_model(st);
                return;
            }
        }
        if (t.size() < 4) {
            warn(st.line_no, "invalid .MODEL: " + st.raw);
            return;
        }
        MosModel m;
        for (size_t i = 2; i + 1 < t.size(); i += 2) {
            std::string key = lower(t[i]);
            double v;
            if (!parse_spice(t[i + 1], &v)) {
                warn(st.line_no, "cannot parse .MODEL param " + t[i]);
                return;
            }
            if (key == "vt") m.vt = v;
            else if (key == "mu") m.mu = v;
            else if (key == "cox") m.cox = v;
            else if (key == "lambda") m.lambda_ = v;
            else if (key == "cj0" || key == "cjo") m.cj0 = v;
            else if (key == "kf") m.kf = v;
            else if (key == "af") m.af = v;
            else if (key == "gamma") m.gamma = v;
            else if (key == "phi") m.phi = v;
        }
        if (m.vt < 0) { m.is_p = true; m.vt = -m.vt; }
        models[t[1]] = m;
    }

    int32_t probe_intern(const std::string& s) {
        return s.empty() ? -1 : intern(s);
    }

    ProbeRec parse_probe_token(const std::string& token) {
        ProbeRec p{};
        p.node1_off = p.node2_off = p.ele_off = p.port_off = -1;
        if (token.empty()) return p;
        char c0 = (char)std::toupper((unsigned char)token[0]);
        long l = -1, r = -1;
        for (size_t i = 0; i < token.size(); ++i) {
            if (token[i] == '(' && l < 0) l = (long)i;
            if (token[i] == ')') r = (long)i;
        }
        if (c0 == 'V') {
            p.kind = 0;
            if (l > 0) {
                std::string head = lower(token.substr(0, l));
                p.mod = head == "vdb" ? 1 : head == "vp" ? 2
                        : head == "vr" ? 3 : head == "vi" ? 4 : 0;
            }
            if (l >= 0 && r > l + 1) {
                std::string inside = token.substr(l + 1, r - l - 1);
                size_t comma = inside.find(',');
                if (comma == std::string::npos) {
                    p.node1_off = probe_intern(trim(inside));
                } else {
                    p.kind = 1;
                    p.node1_off = probe_intern(trim(inside.substr(0, comma)));
                    p.node2_off = probe_intern(trim(inside.substr(comma + 1)));
                }
            }
        } else if (c0 == 'I') {
            p.kind = 2;
            if (l >= 0 && r > l + 1)
                p.ele_off = probe_intern(trim(token.substr(l + 1, r - l - 1)));
        }
        return p;
    }

    // ---- .PARAM machinery (mirror of NetlistParser in netlist/parser.py)
    std::unordered_map<std::string, double> param_values;

    // merge_brace_groups / normalize_eq are now file-scope free
    // functions (shared with SubcktFlattener)

    void collect_param_card(const Statement& st,
                            std::vector<std::pair<std::string,
                                                  std::string>>& defs,
                            std::vector<int>& def_lines) {
        std::vector<std::string> rest(st.tokens.begin() + 1,
                                      st.tokens.end());
        std::string norm = normalize_eq(rest);
        std::vector<std::string> toks;
        {
            std::istringstream iss(norm);
            std::string tok;
            while (iss >> tok) toks.push_back(tok);
        }
        for (const auto& tok : merge_brace_groups(toks)) {
            size_t eq = tok.find('=');
            if (eq == std::string::npos) {
                warn(st.line_no, "invalid .PARAM assignment: '" + tok + "'");
                continue;
            }
            std::string name = tok.substr(0, eq);
            std::string expr = tok.substr(eq + 1);
            // trim
            while (!expr.empty() && std::isspace((unsigned char)expr.front()))
                expr.erase(expr.begin());
            while (!expr.empty() && std::isspace((unsigned char)expr.back()))
                expr.pop_back();
            if (expr.size() >= 2 && expr.front() == '{' && expr.back() == '}')
                expr = expr.substr(1, expr.size() - 2);
            if (name.empty() || expr.empty()) {
                warn(st.line_no, "invalid .PARAM assignment: '" + tok + "'");
                continue;
            }
            defs.emplace_back(lower(name), expr);
            def_lines.push_back(st.line_no);
        }
    }

    void resolve_params(
            const std::vector<std::pair<std::string, std::string>>& defs,
            const std::vector<int>& def_lines) {
        // last definition of a name wins; forward references by iteration
        std::vector<std::string> order;        // insertion order
        std::unordered_map<std::string, std::string> table;
        std::unordered_map<std::string, int> lines;
        for (size_t i = 0; i < defs.size(); ++i) {
            if (!table.count(defs[i].first)) order.push_back(defs[i].first);
            table[defs[i].first] = defs[i].second;
            lines[defs[i].first] = def_lines[i];
        }
        for (size_t pass = 0; pass <= table.size(); ++pass) {
            bool progress = false, missing = false;
            for (const auto& n : order) {
                if (param_values.count(n)) continue;
                double v;
                if (eval_expr(table[n], param_values, &v)) {
                    param_values[n] = v;
                    progress = true;
                } else {
                    missing = true;
                }
            }
            if (!missing || !progress) break;
        }
        for (const auto& n : order) {
            if (!param_values.count(n))
                warn(lines[n], ".PARAM " + n + ": cannot resolve expression '"
                                   + table.at(n) + "'");
        }
        for (const auto& n : order) {
            if (param_values.count(n))
                out.params.push_back(
                    ParamRec{intern(n), param_values.at(n)});
        }
    }

    std::vector<std::string> substitute_params(
            const std::vector<std::string>& tokens, int line_no) {
        std::vector<std::string> outv;
        for (const auto& tok : merge_brace_groups(tokens)) {
            if (tok.find('{') == std::string::npos) {
                outv.push_back(tok);
                continue;
            }
            std::string res;
            size_t i = 0;
            while (i < tok.size()) {
                if (tok[i] == '{') {
                    size_t j = tok.find('}', i);
                    if (j == std::string::npos) {
                        warn(line_no, "unbalanced braces in '" + tok + "'");
                        res += tok.substr(i);
                        break;
                    }
                    std::string expr = tok.substr(i + 1, j - i - 1);
                    double v;
                    if (eval_expr(expr, param_values, &v)) {
                        char buf[40];
                        std::snprintf(buf, sizeof buf, "%.17g", v);
                        res += buf;
                    } else {
                        warn(line_no,
                             "cannot evaluate {" + expr + "}: expression error");
                        res += "0";
                    }
                    i = j + 1;
                } else {
                    res += tok[i];
                    ++i;
                }
            }
            outv.push_back(res);
        }
        return outv;
    }

    // .STEP PARAM name start stop incr | .STEP PARAM name LIST v... |
    // .STEP <src> start stop incr  (mirror of _parse_step_card)
    void parse_step(const Statement& st) {
        const auto& t = st.tokens;
        if (t.size() < 4) {
            warn(st.line_no, "invalid .STEP syntax: " + st.raw);
            return;
        }
        StepRec rec{};
        size_t idx;
        if (lower(t[1]) == "param") {
            rec.kind = 0;
            rec.name_off = intern(lower(t[2]));
            idx = 3;
        } else if (lower(t[1]) == "temp") {
            rec.kind = 2;
            rec.name_off = intern("temp");
            idx = 2;
        } else {
            rec.kind = 1;
            rec.name_off = intern(t[1]);
            idx = 2;
        }
        std::vector<double> vals;
        if (idx < t.size() && lower(t[idx]) == "list") {
            for (size_t i = idx + 1; i < t.size(); ++i) {
                double v;
                if (!parse_spice(t[i], &v)) {
                    warn(st.line_no,
                         "cannot parse .STEP values: bad number in '" +
                             st.raw + "'");
                    return;
                }
                vals.push_back(v);
            }
        } else {
            if (t.size() < idx + 3) {
                warn(st.line_no, "cannot parse .STEP values: need start "
                                 "stop incr in '" + st.raw + "'");
                return;
            }
            double start, stop, incr;
            if (!parse_spice(t[idx], &start) ||
                !parse_spice(t[idx + 1], &stop) ||
                !parse_spice(t[idx + 2], &incr)) {
                warn(st.line_no, "cannot parse .STEP values: bad number in '"
                                     + st.raw + "'");
                return;
            }
            if (incr == 0.0 || (stop - start) * incr < 0) {
                warn(st.line_no, "cannot parse .STEP values: bad increment "
                                 "in '" + st.raw + "'");
                return;
            }
            long n = (long)(std::fabs((stop - start) / incr) + 1e-9) + 1;
            for (long i = 0; i < n; ++i) vals.push_back(start + i * incr);
        }
        if (vals.empty()) {
            warn(st.line_no, ".STEP with no values: " + st.raw);
            return;
        }
        rec.val_off = (int32_t)out.step_pool.size();
        rec.n_vals = (int32_t)vals.size();
        out.step_pool.insert(out.step_pool.end(), vals.begin(), vals.end());
        out.steps.push_back(rec);
    }

    // .MEASURE TRAN name <AVG|RMS|...|TRIG...TARG...|WHEN...|FIND...>
    // mirrors NetlistParser._parse_measure_card (netlist/parser.py)
    void parse_measure(const Statement& st) {
        const auto& t = st.tokens;
        std::string text;
        for (size_t i = 1; i < t.size(); ++i) {
            if (!text.empty()) text += " ";
            text += t[i];
        }
        std::string norm;   // 'VAL = 1.5' -> 'VAL=1.5'
        for (size_t i = 0; i < text.size(); ++i) {
            if (text[i] == ' ' &&
                ((i + 1 < text.size() && text[i + 1] == '=') ||
                 (!norm.empty() && norm.back() == '='))) continue;
            norm += text[i];
        }
        std::vector<std::string> toks;
        {
            std::istringstream iss(norm);
            std::string tok;
            while (iss >> tok) toks.push_back(tok);
        }
        if (toks.size() < 3) {
            warn(st.line_no, "invalid .MEASURE syntax: " + st.raw);
            return;
        }
        std::string an = lower(toks[0]);
        int av = an == "tran" ? 4 : an == "dc" ? 2 : an == "ac" ? 3 : 0;
        if (!av) {
            warn(st.line_no,
                 "unsupported .MEASURE analysis '" + toks[0] + "': " + st.raw);
            return;
        }
        MeasureRec m{};
        m.analysis = av;
        m.name_off = intern(toks[1]);
        m.stat_off = -1;
        m.expr_off = -1;
        m.p1 = parse_probe_token("");
        m.p2 = parse_probe_token("");
        m.p3 = parse_probe_token("");
        m.n1 = m.n2 = 1;
        m.t_to = std::numeric_limits<double>::infinity();

        auto edge_code = [](const std::string& k) {
            return k == "rise" ? 1 : k == "fall" ? 2 : 0;
        };
        // KEY=VALUE applier; which: 0 = window keys only, 1 = ev1, 2 = ev2.
        // Returns the index of the first non-KEY=VALUE token (or kv.size()).
        auto apply_kv = [&](const std::vector<std::string>& kv,
                            int which) -> size_t {
            for (size_t i = 0; i < kv.size(); ++i) {
                size_t eq = kv[i].find('=');
                if (eq == std::string::npos) return i;
                std::string k = lower(kv[i].substr(0, eq));
                std::string v = kv[i].substr(eq + 1);
                double d;
                if ((k == "rise" || k == "fall" || k == "cross") && which) {
                    int n;
                    if (lower(v) == "last") {
                        n = -1;
                    } else {
                        char* e2 = nullptr;
                        double dn = std::strtod(v.c_str(), &e2);
                        if (e2 == v.c_str()) {
                            warn(st.line_no, "cannot parse .MEASURE " + k +
                                                 ": " + st.raw);
                            continue;
                        }
                        n = (int)dn;
                    }
                    if (which == 1) { m.edge1 = edge_code(k); m.n1 = n; }
                    else            { m.edge2 = edge_code(k); m.n2 = n; }
                } else if (k == "val" && which) {
                    if (parse_spice(v, &d)) (which == 1 ? m.val1 : m.val2) = d;
                    else warn(st.line_no, "cannot parse .MEASURE val: " + st.raw);
                } else if (k == "td" && which) {
                    if (parse_spice(v, &d)) (which == 1 ? m.td1 : m.td2) = d;
                    else warn(st.line_no, "cannot parse .MEASURE td: " + st.raw);
                } else if (k == "from") {
                    if (parse_spice(v, &d)) m.t_from = d;
                    else warn(st.line_no, "cannot parse .MEASURE from: " + st.raw);
                } else if (k == "to") {
                    if (parse_spice(v, &d)) m.t_to = d;
                    else warn(st.line_no, "cannot parse .MEASURE to: " + st.raw);
                } else if (k == "at") {
                    if (parse_spice(v, &d)) m.at = d;
                    else warn(st.line_no, "cannot parse .MEASURE at: " + st.raw);
                } else {
                    warn(st.line_no,
                         "unknown .MEASURE key '" + k + "': " + st.raw);
                }
            }
            return kv.size();
        };
        // <probe>[=val] [VAL=v] [RISE|FALL|CROSS=n] [TD=t]
        auto parse_event = [&](std::vector<std::string> ts,
                               int which) -> bool {
            if (ts.empty()) return true;
            std::string ptok = ts[0];
            size_t rp = ptok.rfind(')');
            size_t re = ptok.rfind('=');
            if (re != std::string::npos && rp != std::string::npos &&
                re > rp) {
                double d;
                if (parse_spice(ptok.substr(re + 1), &d))
                    (which == 1 ? m.val1 : m.val2) = d;
                else
                    warn(st.line_no,
                         "cannot parse .MEASURE WHEN value: " + st.raw);
                ptok = ptok.substr(0, re);
            }
            ProbeRec pr = parse_probe_token(ptok);
            if (which == 1) m.p2 = pr; else m.p3 = pr;
            std::vector<std::string> kv(ts.begin() + 1, ts.end());
            return apply_kv(kv, which) == kv.size();
        };

        std::vector<std::string> rest(toks.begin() + 2, toks.end());
        std::string h2 = lower(rest[0]);
        static const char* kStats[] = {"avg", "rms", "min", "max", "pp",
                                       "integ", "min_at", "max_at"};
        bool is_stat = false;
        for (const char* s2 : kStats) is_stat = is_stat || h2 == s2;
        if (is_stat) {
            m.kind = 0;
            m.stat_off = intern(h2);
            if (rest.size() < 2) {
                warn(st.line_no,
                     "invalid .MEASURE: missing probe in '" + st.raw + "'");
                return;
            }
            m.p1 = parse_probe_token(rest[1]);
            apply_kv(std::vector<std::string>(rest.begin() + 2, rest.end()),
                     0);
        } else if (h2 == "trig") {
            m.kind = 1;
            size_t tidx = 0;
            for (size_t i = 1; i < rest.size(); ++i)
                if (lower(rest[i]) == "targ") { tidx = i; break; }
            if (!tidx) {
                warn(st.line_no,
                     "invalid .MEASURE: TRIG without TARG in '" + st.raw + "'");
                return;
            }
            if (!parse_event({rest.begin() + 1, rest.begin() + tidx}, 1) ||
                !parse_event({rest.begin() + tidx + 1, rest.end()}, 2)) {
                warn(st.line_no,
                     "invalid .MEASURE: unparsed tokens in '" + st.raw + "'");
                return;
            }
        } else if (h2 == "when") {
            m.kind = 2;
            if (!parse_event({rest.begin() + 1, rest.end()}, 1)) {
                warn(st.line_no,
                     "invalid .MEASURE: unparsed tokens in '" + st.raw + "'");
                return;
            }
        } else if (h2.rfind("param=", 0) == 0) {
            m.kind = 5;
            std::string text2;
            for (const auto& rtok : rest) {
                if (!text2.empty()) text2 += " ";
                text2 += rtok;
            }
            text2 = text2.substr(6);
            while (!text2.empty() &&
                   std::isspace((unsigned char)text2.front()))
                text2.erase(text2.begin());
            while (!text2.empty() &&
                   std::isspace((unsigned char)text2.back()))
                text2.pop_back();
            if (text2.size() >= 2 && text2.front() == text2.back() &&
                (text2.front() == '\'' || text2.front() == '"'))
                text2 = text2.substr(1, text2.size() - 2);
            else if (text2.size() >= 2 && text2.front() == '{' &&
                     text2.back() == '}')
                text2 = text2.substr(1, text2.size() - 2);
            if (text2.empty()) {
                warn(st.line_no,
                     "invalid .MEASURE: empty PARAM expression in '" +
                         st.raw + "'");
                return;
            }
            if (!validate_expr_syntax(text2, false)) {
                warn(st.line_no,
                     "invalid .MEASURE: bad PARAM expression in '" +
                         st.raw + "'");
                return;
            }
            m.expr_off = intern(text2);
        } else if (h2 == "find") {
            if (rest.size() < 3) {
                warn(st.line_no,
                     "invalid .MEASURE: FIND needs a probe and AT=/WHEN in '" +
                         st.raw + "'");
                return;
            }
            m.p1 = parse_probe_token(rest[1]);
            std::string nxt = lower(rest[2]);
            if (nxt.rfind("at=", 0) == 0) {
                m.kind = 4;
                apply_kv(std::vector<std::string>(rest.begin() + 2,
                                                  rest.end()), 0);
            } else if (nxt == "when") {
                m.kind = 3;
                if (!parse_event({rest.begin() + 3, rest.end()}, 1)) {
                    warn(st.line_no,
                         "invalid .MEASURE: unparsed tokens in '" + st.raw +
                             "'");
                    return;
                }
            } else {
                warn(st.line_no, "invalid .MEASURE: FIND expects AT=/WHEN in '"
                                     + st.raw + "'");
                return;
            }
        } else {
            warn(st.line_no,
                 "invalid .MEASURE: unknown form '" + rest[0] + "' in '" +
                     st.raw + "'");
            return;
        }
        out.measures.push_back(m);
    }

    void dot_card(const Statement& st) {
        const auto& t = st.tokens;
        std::string head = lower(t[0]);
        if (head == ".op") {
            out.config.do_op = 1;
        } else if (head == ".dc") {
            if (t.size() < 5) {
                warn(st.line_no, "invalid .DC syntax: " + st.raw);
                return;
            }
            SweepRec s{};
            s.source_off = intern(t[1]);
            s.source2_off = -1;
            if (!parse_spice(t[2], &s.start) || !parse_spice(t[3], &s.stop) ||
                !parse_spice(t[4], &s.step)) {
                warn(st.line_no, "cannot parse .DC numbers: " + st.raw);
                return;
            }
            if (t.size() >= 9) {
                // nested outer sweep: `.DC s1 a1 b1 d1 s2 a2 b2 d2`
                if (parse_spice(t[6], &s.start2) &&
                    parse_spice(t[7], &s.stop2) &&
                    parse_spice(t[8], &s.step2)) {
                    s.source2_off = intern(t[5]);
                } else {
                    warn(st.line_no,
                         "cannot parse .DC second-sweep numbers: " + st.raw);
                }
            }
            out.sweeps.push_back(s);
        } else if (head == ".tran") {
            if (t.size() < 3) {
                warn(st.line_no, "invalid .TRAN syntax: " + st.raw);
                return;
            }
            size_t ntok = t.size();
            if (ntok >= 2 && lower(t[ntok - 1]) == "uic") {
                out.config.tran_uic = 1;
                --ntok;
            }
            if (ntok < 3) {
                warn(st.line_no, "invalid .TRAN syntax: " + st.raw);
                return;
            }
            double ts, tp, t0 = 0.0;
            if (!parse_spice(t[1], &ts) || !parse_spice(t[2], &tp) ||
                (ntok >= 4 && !parse_spice(t[3], &t0))) {
                warn(st.line_no, "cannot parse .TRAN numbers: " + st.raw);
                return;
            }
            out.config.tran_enabled = 1;
            out.config.tstep = ts;
            out.config.tstop = tp;
            out.config.tstart = t0;
        } else if (head == ".ac") {
            if (t.size() < 5) {
                warn(st.line_no, "invalid .AC syntax: " + st.raw);
                return;
            }
            std::string sw = lower(t[1]);
            int swv = sw == "lin" ? 0 : (sw == "oct" ? 2 : 1);
            char* end = nullptr;
            long np = std::strtol(t[2].c_str(), &end, 10);
            double f0, f1;
            if (end == t[2].c_str() || !parse_spice(t[3], &f0) ||
                !parse_spice(t[4], &f1)) {
                warn(st.line_no, "cannot parse .AC arguments: " + st.raw);
                return;
            }
            out.config.ac_enabled = 1;
            out.config.ac_sweep = swv;
            out.config.ac_npoints = (int32_t)np;
            out.config.fstart = f0;
            out.config.fstop = f1;
        } else if (head == ".hb") {
            if (t.size() < 3) {
                warn(st.line_no, "invalid .hb syntax: " + st.raw);
                return;
            }
            double f0;
            char* end = nullptr;
            long nh = std::strtol(t[2].c_str(), &end, 10);
            if (!parse_spice(t[1], &f0) || end == t[2].c_str()) {
                warn(st.line_no, "cannot parse .hb arguments: " + st.raw);
                return;
            }
            out.config.hb_enabled = 1;
            out.config.hb_f0 = f0;
            out.config.hb_nharm = (int32_t)nh;
            for (size_t i = 3; i + 1 < t.size()
                 && out.config.hb_extra_ntones < 4; i += 2) {
                double fx;
                char* e2 = nullptr;
                long nx = std::strtol(t[i + 1].c_str(), &e2, 10);
                if (!parse_spice(t[i], &fx) || e2 == t[i + 1].c_str()) {
                    warn(st.line_no, "cannot parse .hb extra tone: " + st.raw);
                    break;
                }
                int32_t j = out.config.hb_extra_ntones++;
                out.config.hb_extra_f[j] = fx;
                out.config.hb_extra_n[j] = (int32_t)nx;
            }
        } else if (head == ".print" || head == ".save" || head == ".probe") {
            bool bare = head != ".print";   // .SAVE/.PROBE: analysis optional
            if (t.size() < (bare ? 2u : 3u)) {
                std::string label = head;
                for (auto& ch : label) ch = (char)std::toupper(
                    (unsigned char)ch);
                warn(st.line_no, "invalid " + label + ": " + st.raw);
                return;
            }
            std::string an = t.size() > 1 ? lower(t[1]) : "";
            int av = an == "op" ? 1 : an == "dc" ? 2 : an == "ac" ? 3
                     : an == "tran" ? 4 : an == "hb" ? 5 : 0;
            size_t start = 2;
            if (!av) {
                if (!bare) {
                    warn(st.line_no,
                         "unknown analysis type in .PRINT: " + st.raw);
                    return;
                }
                start = 1;             // analysis-less probes (AN_NONE)
            }
            for (size_t i = start; i < t.size(); ++i) {
                ProbeRec p = parse_probe_token(t[i]);
                p.analysis = av;
                out.probes.push_back(p);
            }
        } else if (head == ".pz") {
            if (t.size() < 2) {
                warn(st.line_no, "invalid .PZ syntax: " + st.raw);
                return;
            }
            ProbeRec pr = parse_probe_token(t[1]);
            if (pr.kind > 1 || pr.node1_off < 0) {
                warn(st.line_no,
                     ".PZ output must be V(node[,ref]): " + st.raw);
                return;
            }
            out.config.pz_out_off = pr.node1_off;
            out.config.pz_ref_off = pr.node2_off;
            if (t.size() > 2) out.config.pz_src_off = intern(t[2]);
        } else if (head == ".sens") {
            if (t.size() < 2) {
                warn(st.line_no, "invalid .SENS syntax: " + st.raw);
                return;
            }
            ProbeRec pr = parse_probe_token(t[1]);
            if (pr.kind > 1 || pr.node1_off < 0) {
                warn(st.line_no,
                     ".SENS output must be V(node[,ref]): " + st.raw);
                return;
            }
            out.config.sens_out_off = pr.node1_off;
            out.config.sens_ref_off = pr.node2_off;
        } else if (head == ".measure" || head == ".meas") {
            parse_measure(st);
        } else if (head == ".param") {
            // handled in the pre-pass (parse())
        } else if (head == ".step") {
            parse_step(st);
        } else if (head == ".tf") {
            if (t.size() < 3) {
                warn(st.line_no, "invalid .TF syntax: " + st.raw);
                return;
            }
            ProbeRec pr = parse_probe_token(t[1]);
            if (pr.kind <= 1 && pr.node1_off >= 0) {
                out.config.tf_enabled = 1;
                out.config.tf_out_kind = 0;
                out.config.tf_out_off = pr.node1_off;
                out.config.tf_ref_off = pr.node2_off;
                out.config.tf_src_off = intern(t[2]);
            } else if (pr.kind == 2 && pr.ele_off >= 0) {
                out.config.tf_enabled = 1;
                out.config.tf_out_kind = 1;
                out.config.tf_elem_off = pr.ele_off;
                out.config.tf_src_off = intern(t[2]);
            } else {
                warn(st.line_no,
                     ".TF output must be V(out[,ref]) or I(elem): " + st.raw);
            }
        } else if (head == ".temp") {
            double tc;
            if (t.size() < 2 || !parse_spice(t[1], &tc)) {
                warn(st.line_no, "invalid .TEMP syntax: " + st.raw);
            } else {
                out.config.temp_set = 1;
                out.config.temp_c = tc;
            }
        } else if (head == ".options" || head == ".option") {
            std::string text;
            for (size_t i = 1; i < t.size(); ++i) {
                if (!text.empty()) text += " ";
                text += t[i];
            }
            // normalize "k = v" to "k=v", then split on whitespace
            std::string norm;
            for (size_t i = 0; i < text.size(); ++i) {
                if (text[i] == ' ' &&
                    ((i + 1 < text.size() && text[i + 1] == '=') ||
                     (!norm.empty() && norm.back() == '='))) continue;
                norm += text[i];
            }
            std::istringstream iss(norm);
            std::string tok;
            while (iss >> tok) {
                size_t eq = tok.find('=');
                std::string k = lower(eq == std::string::npos
                                          ? tok : tok.substr(0, eq));
                std::string v = eq == std::string::npos
                                    ? "1" : tok.substr(eq + 1);
                OptRec o{intern(k), intern(v)};
                out.options.push_back(o);
            }
        } else if (head == ".ic" || head == ".nodeset") {
            std::vector<IcRec>& sink =
                (head == ".ic") ? out.ics : out.nodesets;
            // .IC V(node)=value ... (extension); '=' may be spaced out.
            // Join tokens, then split on "V(" occurrences.
            std::string text;
            for (size_t i = 1; i < t.size(); ++i) text += t[i];
            bool any = false;
            size_t pos = 0;
            while (pos + 1 < text.size()) {
                if (std::toupper((unsigned char)text[pos]) != 'V' ||
                    text[pos + 1] != '(') { ++pos; continue; }
                size_t r = text.find(')', pos);
                if (r == std::string::npos) break;
                size_t eq = text.find('=', r);
                if (eq == std::string::npos) break;
                // value runs to the next "V(" or end of text
                size_t nxt = eq + 1;
                while (nxt + 1 < text.size() &&
                       !(std::toupper((unsigned char)text[nxt]) == 'V' &&
                         text[nxt + 1] == '(')) ++nxt;
                size_t vend = (nxt + 1 < text.size()) ? nxt : text.size();
                std::string node = text.substr(pos + 2, r - pos - 2);
                std::string sval = text.substr(eq + 1, vend - eq - 1);
                double val;
                if (parse_spice(sval, &val)) {
                    IcRec ic{intern(node), val};
                    sink.push_back(ic);
                    any = true;
                }
                pos = vend;
            }
            if (!any) warn(st.line_no, "invalid .IC/.NODESET syntax: " + st.raw);
        } else if (head == ".four") {
            double f0;
            if (t.size() < 3 || !parse_spice(t[1], &f0)) {
                warn(st.line_no, "invalid .FOUR syntax: " + st.raw);
                return;
            }
            for (size_t i = 2; i < t.size(); ++i) {
                ProbeRec p = parse_probe_token(t[i]);
                p.analysis = 6;  // .FOUR tag
                out.probes.push_back(p);
            }
            out.config.four_enabled = 1;
            out.config.four_f0 = f0;
        } else if (head == ".noise") {
            if (t.size() < 2) {
                warn(st.line_no, "invalid .NOISE syntax: " + st.raw);
                return;
            }
            ProbeRec pr = parse_probe_token(t[1]);
            if (pr.kind > 1 || pr.node1_off < 0) {
                warn(st.line_no,
                     ".NOISE output must be V(node[,ref]): " + st.raw);
                return;
            }
            out.config.noise_out_off = pr.node1_off;
            out.config.noise_ref_off = pr.node2_off;
            size_t i = 2;
            if (i < t.size()) {
                std::string sw = lower(t[i]);
                if (sw != "lin" && sw != "dec" && sw != "oct") {
                    out.config.noise_src_off = intern(t[i]);
                    ++i;
                }
            }
            if (i + 3 < t.size()) {
                std::string sw = lower(t[i]);
                int swv = sw == "lin" ? 0 : (sw == "oct" ? 2 : 1);
                char* end = nullptr;
                long np = std::strtol(t[i + 1].c_str(), &end, 10);
                double f0, f1;
                if (end == t[i + 1].c_str() ||
                    !parse_spice(t[i + 2], &f0) ||
                    !parse_spice(t[i + 3], &f1)) {
                    warn(st.line_no, "cannot parse .NOISE sweep: " + st.raw);
                    return;
                }
                out.config.noise_sweep = swv;
                out.config.noise_npoints = (int32_t)np;
                out.config.noise_fstart = f0;
                out.config.noise_fstop = f1;
            }
            out.config.noise_enabled = 1;
        } else if (head == ".plotnv") {
            if (t.size() < 2) {
                warn(st.line_no, "invalid .PLOTNV: " + st.raw);
                return;
            }
            for (size_t i = 1; i < t.size(); ++i) {
                ProbeRec p{};
                p.analysis = 0;
                p.kind = 0;
                p.node1_off = probe_intern(t[i]);
                p.node2_off = p.ele_off = p.port_off = -1;
                out.probes.push_back(p);
            }
        } else if (head == ".plotnc") {
            if (t.size() < 2) {
                warn(st.line_no, "invalid .PLOTNC: " + st.raw);
                return;
            }
            for (size_t i = 1; i < t.size(); ++i) {
                ProbeRec p{};
                p.analysis = 0;
                p.kind = 2;
                p.node1_off = p.node2_off = p.port_off = -1;
                const std::string& tok = t[i];
                long l = -1, r = -1;
                for (size_t j = 0; j < tok.size(); ++j) {
                    if (tok[j] == '(' && l < 0) l = (long)j;
                    if (tok[j] == ')') r = (long)j;
                }
                if (l < 0) {
                    p.ele_off = probe_intern(tok);
                } else {
                    p.ele_off = probe_intern(trim(tok.substr(0, l)));
                    p.port_off = probe_intern(trim(tok.substr(l + 1, r - l - 1)));
                }
                out.probes.push_back(p);
            }
        } else if (head != ".model" && head != ".end") {
            // .end terminates a deck (standard SPICE); nothing to do
            warn(st.line_no, "unsupported control card: " + st.raw);
        }
    }

    // ---- driver ----
    void parse(const std::string& text) {
        out.config.ac_sweep = 1;  // default sweep type is DEC (parser.cpp:439)
        out.config.noise_out_off = out.config.noise_ref_off = -1;
        out.config.noise_src_off = -1;
        out.config.noise_sweep = -1;
        out.config.sens_out_off = out.config.sens_ref_off = -1;
        out.config.pz_out_off = out.config.pz_ref_off = -1;
        out.config.pz_src_off = -1;
        out.config.tf_out_off = out.config.tf_ref_off = -1;
        out.config.tf_elem_off = out.config.tf_src_off = -1;
        std::vector<Statement> stmts =
            SubcktFlattener(diag).run(lex(text));
        // .PARAM pre-pass: resolve the table, substitute {expr} everywhere
        std::vector<std::pair<std::string, std::string>> defs;
        std::vector<int> def_lines;
        for (const auto& st : stmts)
            if (!st.tokens.empty() && lower(st.tokens[0]) == ".param")
                collect_param_card(st, defs, def_lines);
        resolve_params(defs, def_lines);
        for (auto& st : stmts) {
            if (st.tokens.empty() || lower(st.tokens[0]) == ".param")
                continue;
            bool braced = false;
            for (const auto& tok : st.tokens)
                braced = braced || tok.find('{') != std::string::npos;
            if (braced)
                st.tokens = substitute_params(st.tokens, st.line_no);
        }
        for (const auto& st : stmts) {
            if (!st.tokens.empty() && lower(st.tokens[0]) == ".model")
                card_model(st);
        }
        for (const auto& st : stmts) {
            if (st.tokens.empty()) continue;
            const std::string& h = st.tokens[0];
            if (h[0] == '.') {
                if (lower(h) != ".model") dot_card(st);
                continue;
            }
            switch (std::toupper((unsigned char)h[0])) {
                case 'R': dev_rcl(st, 0); break;
                case 'C': dev_rcl(st, 1); break;
                case 'L': dev_rcl(st, 2); break;
                case 'V': dev_vsource(st); break;
                case 'I': dev_isource(st); break;
                case 'M': dev_mosfet(st); break;
                case 'D': dev_diode(st); break;
                case 'Q': dev_bjt(st); break;
                case 'E': dev_ctrl(st, 8); break;
                case 'G': dev_ctrl(st, 9); break;
                case 'F': dev_ctrl(st, 10); break;
                case 'H': dev_ctrl(st, 11); break;
                case 'K': dev_mutual(st); break;
                case 'S': dev_switch(st, 'S'); break;
                case 'W': dev_switch(st, 'W'); break;
                case 'J': dev_jfet(st); break;
                case 'T': dev_tline(st); break;
                case 'B': dev_bsource(st); break;
                default:
                    warn(st.line_no,
                         "unsupported element or syntax: " + st.raw);
            }
        }
        // implied .OP when nothing was requested (sim.hpp:219-225)
        bool any = out.config.do_op || !out.sweeps.empty() ||
                   out.config.tran_enabled || out.config.ac_enabled ||
                   out.config.hb_enabled;
        out.config.do_op = any ? out.config.do_op : 1;

        // equation numbering: non-ground nodes in creation order, then V/L
        // branch currents in element order (circuit.cpp:42-61)
        int32_t eq = 0;
        for (auto& n : out.nodes) {
            const char* nm = out.str_pool.c_str() + n.name_off;
            n.eq_index = is_ground(nm) ? -1 : eq++;
        }
        for (auto& e : out.elements) {
            if (e.kind == 3 || e.kind == 2 || e.kind == 8 || e.kind == 11) {
                e.branch_eq = eq++;
            } else if (e.kind == 16) {      // T line: one branch per port
                e.branch_eq = eq++;
                e.branch_eq2 = eq++;
            } else if (e.kind == 17 && e.b_is_v) {   // B V=expr form
                e.branch_eq = eq++;
            }
        }
        out.diagnostics = diag.str();
    }
};

}  // namespace

// ----------------------------------------------------------------------
// C ABI
// ----------------------------------------------------------------------
extern "C" {

void* csim_parse(const char* text) {
    auto* fe = new Frontend();
    fe->parse(text ? text : "");
    return fe;
}

void csim_free(void* h) { delete static_cast<Frontend*>(h); }

#define FE static_cast<Frontend*>(h)->out

int32_t csim_n_elements(void* h) { return (int32_t)FE.elements.size(); }
int32_t csim_n_nodes(void* h) { return (int32_t)FE.nodes.size(); }
int32_t csim_n_probes(void* h) { return (int32_t)FE.probes.size(); }
int32_t csim_n_sweeps(void* h) { return (int32_t)FE.sweeps.size(); }
int32_t csim_n_ics(void* h) { return (int32_t)FE.ics.size(); }
int32_t csim_n_nodesets(void* h) { return (int32_t)FE.nodesets.size(); }
int32_t csim_n_options(void* h) { return (int32_t)FE.options.size(); }
int32_t csim_n_measures(void* h) { return (int32_t)FE.measures.size(); }
int32_t csim_n_params(void* h) { return (int32_t)FE.params.size(); }
int32_t csim_n_step_cards(void* h) { return (int32_t)FE.steps.size(); }
int32_t csim_step_pool_size(void* h) { return (int32_t)FE.step_pool.size(); }
int32_t csim_n_pwl(void* h) { return (int32_t)FE.pwl_pool.size(); }
int32_t csim_strpool_size(void* h) { return (int32_t)FE.str_pool.size(); }

const void* csim_elements(void* h) { return FE.elements.data(); }
const void* csim_nodes(void* h) { return FE.nodes.data(); }
const void* csim_probes(void* h) { return FE.probes.data(); }
const void* csim_sweeps(void* h) { return FE.sweeps.data(); }
const void* csim_ics(void* h) { return FE.ics.data(); }
const void* csim_nodesets(void* h) { return FE.nodesets.data(); }
const void* csim_options(void* h) { return FE.options.data(); }
const void* csim_measures(void* h) { return FE.measures.data(); }
const void* csim_params(void* h) { return FE.params.data(); }
const void* csim_step_cards(void* h) { return FE.steps.data(); }
const double* csim_step_pool(void* h) { return FE.step_pool.data(); }
const double* csim_pwl(void* h) { return FE.pwl_pool.data(); }
const char* csim_strpool(void* h) { return FE.str_pool.c_str(); }
const void* csim_config(void* h) { return &FE.config; }
const char* csim_diagnostics(void* h) { return FE.diagnostics.c_str(); }

int32_t csim_abi_version(void) { return 16; }
}
