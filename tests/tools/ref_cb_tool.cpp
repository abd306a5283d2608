// Differential-test oracle for the CALLBACK surface: registers one
// unconditional node callback, K selector-guarded callbacks and one
// error callback against the READ-ONLY reference parser, then echoes
// the fired-event stream so pytest can compare the Python kernel's
// CallbackParser dispatch byte-for-byte (handle order, matcher
// choice, the first-matcher-only quirk, close-tag events, EOF
// errors). Test harness only — no reference code is copied.
//
// Protocol per case (stdin):
//   <doclen>\n<doc>\n<K>\n then K of: <sellen>\n<selector>\n
// Answer (stdout): <n_events>\n then per event:
//   <cb_idx> <tag_len>\n<tag_name>\n<idlen>\n<attr id value>\n
// cb_idx: 0 = unconditional, 1..K = selector cb, -1 = error cb.
#include "html.hpp"
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

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
        int k = std::stoi(line);
        std::vector<std::string> sels;
        for (int i = 0; i < k; i++) {
            std::getline(std::cin, line);
            size_t sl = std::stoul(line);
            std::string sel(sl, '\0');
            if (sl) std::cin.read(&sel[0], sl);
            std::cin.ignore(1);
            sels.push_back(sel);
        }
        std::ostringstream ev;
        int n_ev = 0;
        html::parser p;
        auto rec = [&](int idx, html::node& n) {
            std::string idv = n.get_attr("id");
            ev << idx << " " << n.tag_name.size() << "\n"
               << n.tag_name << "\n" << idv.size() << "\n"
               << idv << "\n";
            n_ev++;
        };
        p.set_callback([&](html::node& n) { rec(0, n); });
        for (int i = 0; i < k; i++) {
            p.set_callback(html::selector(sels[i]),
                           [&, i](html::node& n) { rec(i + 1, n); });
        }
        p.set_callback([&](html::err_t, html::node& n) { rec(-1, n); });
        p.parse(doc);
        std::cout << n_ev << "\n" << ev.str();
        std::cout.flush();
    }
    return 0;
}
