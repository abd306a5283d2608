// Differential-test oracle for the SELECTOR engine: compiles against
// the READ-ONLY reference parser (/root/reference) and echoes
// node::select results so pytest can compare the Python kernel's
// select() byte-for-byte. Test harness only — no reference code is
// copied into the engine.
//
// Protocol per case (stdin):
//   <doclen>\n<doc bytes>\n<sellen>\n<selector bytes>\n<nested 0|1>\n
// Answer (stdout):
//   <n_matches>\n then per match, length-prefixed to_raw_html() of the
//   matched node's subtree (pins identity, order and multiplicity).
#include "html.hpp"
#include <iostream>
#include <string>

int main() {
    std::ios::sync_with_stdio(false);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t dl = std::stoul(line);
        std::string doc(dl, '\0');
        if (dl) std::cin.read(&doc[0], dl);
        std::cin.ignore(1);
        std::getline(std::cin, line);
        size_t sl = std::stoul(line);
        std::string sel(sl, '\0');
        if (sl) std::cin.read(&sel[0], sl);
        std::cin.ignore(1);
        std::getline(std::cin, line);
        bool nested = line == "1";
        html::parser p;
        auto d = p.parse(doc);
        auto ms = d->select(html::selector(sel), nested);
        std::cout << ms.size() << "\n";
        for (auto* n : ms) {
            std::string h = n->to_raw_html();
            std::cout << h.size() << "\n" << h << "\n";
        }
        std::cout.flush();
    }
    return 0;
}
