// Differential-test oracle for the BUILD surface: node::append's deep
// copy with destination-side index reassignment (html.cpp:515-537,
// 262-273) and utils::make_node (html.cpp:1013-1028). Parses two docs,
// appends the first select-match of doc2 (selector2) into the first
// select-match of doc1 (selector1; root when empty/no match), then
// appends make_node(tag "x1", {id:mk}) and make_node(text "mt") to the
// same target, and echoes the mutated doc's to_raw_html + to_html plus
// the to_raw_html of every match of three fixed post-append probe
// selectors (x1:last, [id='mk'], li:eq(2)) so reassigned indices are
// observable. Test harness only — no reference code is copied.
//
// Protocol per case (stdin):
//   <len1>\n<doc1>\n<sel1len>\n<sel1>\n<len2>\n<doc2>\n<sel2len>\n<sel2>\n
// Answer (stdout): 5 length-prefixed fields:
//   raw_html, pretty_html, probe1 matches (joined \x1f), probe2, probe3
#include "html.hpp"
#include <iostream>
#include <string>
#include <vector>

static std::string read_blob(std::istream& in) {
    std::string line;
    while (std::getline(in, line) && line.empty()) {}
    if (!in) return std::string();
    size_t ln = std::stoul(line);
    std::string s(ln, '\0');
    if (ln) in.read(&s[0], ln);
    in.ignore(1);
    return s;
}

static void emit(const std::string& s) {
    std::cout << s.size() << "\n" << s << "\n";
}

int main() {
    std::ios::sync_with_stdio(false);
    while (std::cin.peek() != EOF) {
        std::string doc1 = read_blob(std::cin);
        if (!std::cin) break;
        std::string sel1 = read_blob(std::cin);
        std::string doc2 = read_blob(std::cin);
        std::string sel2 = read_blob(std::cin);
        html::parser p1, p2;
        html::node_ptr d1 = p1.parse(doc1);
        html::node_ptr d2 = p2.parse(doc2);
        html::node* target = d1.get();
        if (!sel1.empty()) {
            auto m = d1->select(sel1);
            if (!m.empty()) target = m.front();
        }
        auto src = d2->select(sel2);
        if (!src.empty()) target->append(*src.front());
        target->append(html::utils::make_node(
            html::node_t::tag, "x1", {{"id", "mk"}}));
        target->append(html::utils::make_node(html::node_t::text, "mt"));
        emit(d1->to_raw_html());
        emit(d1->to_html());
        for (const char* probe : {"x1:last", "[id='mk']", "li:eq(2)"}) {
            auto ms = d1->select(probe);
            std::string joined;
            for (size_t i = 0; i < ms.size(); i++) {
                if (i) joined += '\x1f';
                joined += ms[i]->to_raw_html();
            }
            emit(joined);
        }
    }
    std::cout.flush();
    return 0;
}
