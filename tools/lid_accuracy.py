"""Held-out accuracy for the trigram lang_id classifier.

The classifier (bm25_spark/operators/textstats.py:lang_id) scores fixed
per-language trigram profiles. This fixture is 300 labeled sentences (20
per language, 15 languages — da/fi/cs/tr/ro added in round 5).
Methodology: every profile revision (round-4 hand tuning, round-5
tools/lid_tune.py margin selection) tuned ONLY on the dev half (first 10
sentences per language); the test half was never consulted during tuning,
so ``test`` is the held-out quality figure reported in BENCH.md. It is a
deliberately honest ceiling: a fixed trigram profile is below
fastText-class LID — the figure quantifies that gap.

Usage: python tools/lid_accuracy.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 20 held-out sentences per language, everyday register, 8-14 words each.
HOLDOUT: list[tuple[str, str]] = [
    # --- English ---
    ("en", "the weather this morning was colder than anyone had expected"),
    ("en", "she finished reading the long report before the meeting started"),
    ("en", "our neighbors are planning to paint their house next summer"),
    ("en", "the train arrived ten minutes late because of the storm"),
    ("en", "he could not remember where he had left the keys"),
    ("en", "the children played in the garden until it got dark"),
    ("en", "this restaurant serves the best soup in the whole town"),
    ("en", "they decided to walk home instead of taking the bus"),
    ("en", "the teacher explained the problem again for the new students"),
    ("en", "we should check the schedule before booking the flight tickets"),
    ("en", "the library closes early on friday during the winter months"),
    ("en", "a small dog was barking loudly outside the office window"),
    ("en", "everyone agreed that the second proposal was much more realistic"),
    ("en", "the engineers tested the bridge for several weeks after construction"),
    ("en", "my sister brought fresh bread from the bakery around the corner"),
    ("en", "the museum exhibition about ancient maps opens next wednesday morning"),
    ("en", "he turned off the lights and locked the front door"),
    ("en", "the committee will announce the final results early next week"),
    ("en", "heavy rain flooded the streets near the old market square"),
    ("en", "she wrote down the address on the back of an envelope"),
    # --- German ---
    ("de", "das Wetter war heute Morgen kälter als alle erwartet hatten"),
    ("de", "sie las den langen Bericht bevor die Besprechung begann"),
    ("de", "unsere Nachbarn wollen ihr Haus im nächsten Sommer streichen"),
    ("de", "der Zug kam wegen des Sturms zehn Minuten zu spät"),
    ("de", "er konnte sich nicht erinnern wo er die Schlüssel gelassen hatte"),
    ("de", "die Kinder spielten im Garten bis es dunkel wurde"),
    ("de", "dieses Restaurant hat die beste Suppe in der ganzen Stadt"),
    ("de", "sie beschlossen zu Fuß nach Hause zu gehen statt den Bus zu nehmen"),
    ("de", "der Lehrer erklärte die Aufgabe noch einmal für die neuen Schüler"),
    ("de", "wir sollten den Fahrplan prüfen bevor wir die Flüge buchen"),
    ("de", "die Bibliothek schließt freitags im Winter schon am frühen Abend"),
    ("de", "ein kleiner Hund bellte laut vor dem Fenster des Büros"),
    ("de", "alle waren sich einig dass der zweite Vorschlag realistischer war"),
    ("de", "die Ingenieure prüften die Brücke mehrere Wochen nach dem Bau"),
    ("de", "meine Schwester brachte frisches Brot von der Bäckerei um die Ecke"),
    ("de", "die Ausstellung über alte Landkarten beginnt am nächsten Mittwoch"),
    ("de", "er machte das Licht aus und schloss die Haustür ab"),
    ("de", "der Ausschuss wird die endgültigen Ergebnisse nächste Woche bekannt geben"),
    ("de", "starker Regen überflutete die Straßen am alten Marktplatz"),
    ("de", "sie schrieb die Adresse auf die Rückseite eines Umschlags"),
    # --- Spanish ---
    ("es", "el tiempo esta mañana era más frío de lo que todos esperaban"),
    ("es", "ella terminó de leer el informe antes de que empezara la reunión"),
    ("es", "nuestros vecinos quieren pintar su casa el próximo verano"),
    ("es", "el tren llegó diez minutos tarde por culpa de la tormenta"),
    ("es", "no podía recordar dónde había dejado las llaves"),
    ("es", "los niños jugaron en el jardín hasta que se hizo de noche"),
    ("es", "este restaurante sirve la mejor sopa de toda la ciudad"),
    ("es", "decidieron volver a casa andando en lugar de tomar el autobús"),
    ("es", "el profesor explicó el problema otra vez para los estudiantes nuevos"),
    ("es", "deberíamos revisar el horario antes de comprar los billetes de avión"),
    ("es", "la biblioteca cierra temprano los viernes durante los meses de invierno"),
    ("es", "un perro pequeño ladraba con fuerza junto a la ventana de la oficina"),
    ("es", "todos estuvieron de acuerdo en que la segunda propuesta era más realista"),
    ("es", "los ingenieros probaron el puente durante varias semanas después de la obra"),
    ("es", "mi hermana trajo pan fresco de la panadería de la esquina"),
    ("es", "la exposición sobre mapas antiguos se inaugura el próximo miércoles"),
    ("es", "apagó las luces y cerró la puerta principal con llave"),
    ("es", "el comité anunciará los resultados finales a principios de la próxima semana"),
    ("es", "la lluvia intensa inundó las calles cerca de la plaza del mercado"),
    ("es", "ella apuntó la dirección en el reverso de un sobre"),
    # --- French ---
    ("fr", "le temps ce matin était plus froid que tout le monde pensait"),
    ("fr", "elle a fini de lire le rapport avant le début de la réunion"),
    ("fr", "nos voisins veulent repeindre leur maison l'été prochain"),
    ("fr", "le train est arrivé dix minutes en retard à cause de la tempête"),
    ("fr", "il ne se souvenait plus où il avait laissé les clés"),
    ("fr", "les enfants ont joué dans le jardin jusqu'à la tombée de la nuit"),
    ("fr", "ce restaurant sert la meilleure soupe de toute la ville"),
    ("fr", "ils ont décidé de rentrer à pied au lieu de prendre le bus"),
    ("fr", "le professeur a expliqué le problème encore une fois aux nouveaux élèves"),
    ("fr", "nous devrions vérifier les horaires avant de réserver les billets d'avion"),
    ("fr", "la bibliothèque ferme tôt le vendredi pendant les mois d'hiver"),
    ("fr", "un petit chien aboyait fort devant la fenêtre du bureau"),
    ("fr", "tout le monde trouvait que la deuxième proposition était plus réaliste"),
    ("fr", "les ingénieurs ont testé le pont pendant plusieurs semaines après les travaux"),
    ("fr", "ma sœur a apporté du pain frais de la boulangerie du coin"),
    ("fr", "l'exposition sur les cartes anciennes ouvre mercredi prochain au matin"),
    ("fr", "il a éteint les lumières et fermé la porte d'entrée à clé"),
    ("fr", "le comité annoncera les résultats définitifs au début de la semaine prochaine"),
    ("fr", "la pluie violente a inondé les rues près de la vieille place du marché"),
    ("fr", "elle a noté l'adresse au dos d'une enveloppe"),
    # --- Italian ---
    ("it", "il tempo questa mattina era più freddo di quanto tutti pensassero"),
    ("it", "ha finito di leggere la relazione prima che iniziasse la riunione"),
    ("it", "i nostri vicini vogliono dipingere la loro casa la prossima estate"),
    ("it", "il treno è arrivato dieci minuti in ritardo a causa della tempesta"),
    ("it", "non riusciva a ricordare dove avesse lasciato le chiavi"),
    ("it", "i bambini hanno giocato in giardino finché non è diventato buio"),
    ("it", "questo ristorante serve la zuppa migliore di tutta la città"),
    ("it", "hanno deciso di tornare a casa a piedi invece di prendere l'autobus"),
    ("it", "il professore ha spiegato di nuovo il problema agli studenti nuovi"),
    ("it", "dovremmo controllare gli orari prima di comprare i biglietti aerei"),
    ("it", "la biblioteca chiude presto il venerdì durante i mesi invernali"),
    ("it", "un piccolo cane abbaiava forte davanti alla finestra dell'ufficio"),
    ("it", "tutti erano d'accordo che la seconda proposta fosse più realistica"),
    ("it", "gli ingegneri hanno collaudato il ponte per diverse settimane dopo i lavori"),
    ("it", "mia sorella ha portato il pane fresco dal forno dietro l'angolo"),
    ("it", "la mostra sulle mappe antiche apre mercoledì prossimo in mattinata"),
    ("it", "ha spento le luci e ha chiuso a chiave la porta d'ingresso"),
    ("it", "il comitato annuncerà i risultati definitivi all'inizio della prossima settimana"),
    ("it", "la pioggia forte ha allagato le strade vicino alla vecchia piazza del mercato"),
    ("it", "ha scritto l'indirizzo sul retro di una busta"),
    # --- Dutch ---
    ("nl", "het weer was vanochtend kouder dan iedereen had verwacht"),
    ("nl", "zij las het lange verslag voordat de vergadering begon"),
    ("nl", "onze buren willen hun huis volgende zomer schilderen"),
    ("nl", "de trein kwam tien minuten te laat door de storm"),
    ("nl", "hij kon zich niet herinneren waar hij de sleutels had gelaten"),
    ("nl", "de kinderen speelden in de tuin totdat het donker werd"),
    ("nl", "dit restaurant serveert de beste soep van de hele stad"),
    ("nl", "ze besloten naar huis te lopen in plaats van de bus te nemen"),
    ("nl", "de leraar legde het probleem nog een keer uit aan de nieuwe studenten"),
    ("nl", "we moeten het schema controleren voordat we de vliegtickets boeken"),
    ("nl", "de bibliotheek sluit vrijdags vroeg tijdens de wintermaanden"),
    ("nl", "een kleine hond blafte hard voor het raam van het kantoor"),
    ("nl", "iedereen was het erover eens dat het tweede voorstel realistischer was"),
    ("nl", "de ingenieurs testten de brug wekenlang na de bouw"),
    ("nl", "mijn zus bracht vers brood van de bakkerij om de hoek"),
    ("nl", "de tentoonstelling over oude kaarten opent volgende week woensdag"),
    ("nl", "hij deed de lichten uit en sloot de voordeur af"),
    ("nl", "de commissie maakt de definitieve uitslag begin volgende week bekend"),
    ("nl", "zware regen zette de straten bij het oude marktplein onder water"),
    ("nl", "ze schreef het adres op de achterkant van een envelop"),
    # --- Polish ---
    ("pl", "pogoda dzisiaj rano była zimniejsza niż wszyscy się spodziewali"),
    ("pl", "skończyła czytać długi raport zanim zaczęło się spotkanie"),
    ("pl", "nasi sąsiedzi chcą pomalować swój dom przyszłego lata"),
    ("pl", "pociąg przyjechał dziesięć minut później z powodu burzy"),
    ("pl", "nie mógł sobie przypomnieć gdzie zostawił klucze"),
    ("pl", "dzieci bawiły się w ogrodzie dopóki nie zrobiło się ciemno"),
    ("pl", "ta restauracja podaje najlepszą zupę w całym mieście"),
    ("pl", "postanowili wrócić do domu pieszo zamiast jechać autobusem"),
    ("pl", "nauczyciel jeszcze raz wyjaśnił zadanie nowym uczniom"),
    ("pl", "powinniśmy sprawdzić rozkład zanim kupimy bilety lotnicze"),
    ("pl", "biblioteka zamyka się wcześnie w piątki podczas zimowych miesięcy"),
    ("pl", "mały pies głośno szczekał przed oknem biura"),
    ("pl", "wszyscy zgodzili się że druga propozycja była bardziej realistyczna"),
    ("pl", "inżynierowie testowali most przez kilka tygodni po zakończeniu budowy"),
    ("pl", "moja siostra przyniosła świeży chleb z piekarni za rogiem"),
    ("pl", "wystawa o dawnych mapach otwiera się w przyszłą środę rano"),
    ("pl", "zgasił światła i zamknął drzwi wejściowe na klucz"),
    ("pl", "komisja ogłosi ostateczne wyniki na początku przyszłego tygodnia"),
    ("pl", "ulewny deszcz zalał ulice w pobliżu starego rynku"),
    ("pl", "zapisała adres na odwrocie koperty"),
    # --- Portuguese ---
    ("pt", "o tempo esta manhã estava mais frio do que todos esperavam"),
    ("pt", "ela terminou de ler o relatório antes de a reunião começar"),
    ("pt", "os nossos vizinhos querem pintar a casa no próximo verão"),
    ("pt", "o comboio chegou dez minutos atrasado por causa da tempestade"),
    ("pt", "ele não conseguia lembrar onde tinha deixado as chaves"),
    ("pt", "as crianças brincaram no jardim até escurecer"),
    ("pt", "este restaurante serve a melhor sopa de toda a cidade"),
    ("pt", "decidiram voltar para casa a pé em vez de apanhar o autocarro"),
    ("pt", "o professor explicou o problema outra vez para os alunos novos"),
    ("pt", "devíamos verificar o horário antes de comprar as passagens de avião"),
    ("pt", "a biblioteca fecha cedo às sextas durante os meses de inverno"),
    ("pt", "um cão pequeno ladrava alto junto à janela do escritório"),
    ("pt", "todos concordaram que a segunda proposta era bem mais realista"),
    ("pt", "os engenheiros testaram a ponte durante várias semanas depois da obra"),
    ("pt", "a minha irmã trouxe pão fresco da padaria da esquina"),
    ("pt", "a exposição sobre mapas antigos abre na próxima quarta de manhã"),
    ("pt", "ele apagou as luzes e trancou a porta da frente"),
    ("pt", "o comité vai anunciar os resultados finais no início da próxima semana"),
    ("pt", "a chuva forte inundou as ruas perto da velha praça do mercado"),
    ("pt", "ela anotou o endereço no verso de um envelope"),
    # --- Russian ---
    ("ru", "погода сегодня утром была холоднее чем все ожидали"),
    ("ru", "она дочитала длинный отчет до начала совещания"),
    ("ru", "наши соседи хотят покрасить свой дом следующим летом"),
    ("ru", "поезд пришел на десять минут позже из-за грозы"),
    ("ru", "он не мог вспомнить где оставил ключи"),
    ("ru", "дети играли в саду пока не стемнело"),
    ("ru", "в этом ресторане подают лучший суп во всем городе"),
    ("ru", "они решили пойти домой пешком вместо автобуса"),
    ("ru", "учитель еще раз объяснил задачу новым ученикам"),
    ("ru", "нам стоит проверить расписание прежде чем покупать билеты на самолет"),
    ("ru", "библиотека зимой закрывается по пятницам довольно рано"),
    ("ru", "маленькая собака громко лаяла под окном офиса"),
    ("ru", "все согласились что второе предложение было более реалистичным"),
    ("ru", "инженеры несколько недель проверяли мост после окончания строительства"),
    ("ru", "моя сестра принесла свежий хлеб из пекарни за углом"),
    ("ru", "выставка старинных карт открывается в следующую среду утром"),
    ("ru", "он выключил свет и запер входную дверь"),
    ("ru", "комитет объявит окончательные результаты в начале следующей недели"),
    ("ru", "сильный дождь затопил улицы возле старой рыночной площади"),
    ("ru", "она записала адрес на обратной стороне конверта"),
    # --- Swedish ---
    ("sv", "vädret i morse var kallare än vad alla hade väntat sig"),
    ("sv", "hon läste klart den långa rapporten innan mötet började"),
    ("sv", "våra grannar vill måla om sitt hus nästa sommar"),
    ("sv", "tåget kom tio minuter för sent på grund av stormen"),
    ("sv", "han kunde inte minnas var han hade lagt nycklarna"),
    ("sv", "barnen lekte i trädgården tills det blev mörkt"),
    ("sv", "den här restaurangen serverar den bästa soppan i hela staden"),
    ("sv", "de bestämde sig för att gå hem i stället för att ta bussen"),
    ("sv", "läraren förklarade problemet en gång till för de nya eleverna"),
    ("sv", "vi borde kontrollera tidtabellen innan vi bokar flygbiljetterna"),
    ("sv", "biblioteket stänger tidigt på fredagar under vintermånaderna"),
    ("sv", "en liten hund skällde högt utanför kontorets fönster"),
    ("sv", "alla var överens om att det andra förslaget var mer realistiskt"),
    ("sv", "ingenjörerna testade bron i flera veckor efter bygget"),
    ("sv", "min syster tog med färskt bröd från bageriet runt hörnet"),
    ("sv", "utställningen om gamla kartor öppnar på onsdag nästa vecka"),
    ("sv", "han släckte lamporna och låste ytterdörren"),
    ("sv", "kommittén kommer att meddela slutresultaten i början av nästa vecka"),
    ("sv", "det kraftiga regnet översvämmade gatorna vid det gamla torget"),
    ("sv", "hon skrev ner adressen på baksidan av ett kuvert"),
    # --- Danish (round 5 widening) ---
    ("da", "vejret i morges var koldere end nogen havde ventet"),
    ("da", "hun læste den lange rapport færdig inden mødet begyndte"),
    ("da", "vores naboer vil male deres hus næste sommer"),
    ("da", "toget kom ti minutter for sent på grund af stormen"),
    ("da", "han kunne ikke huske hvor han havde lagt nøglerne"),
    ("da", "børnene legede i haven indtil det blev mørkt"),
    ("da", "denne restaurant serverer den bedste suppe i hele byen"),
    ("da", "de besluttede at gå hjem i stedet for at tage bussen"),
    ("da", "læreren forklarede opgaven igen for de nye elever"),
    ("da", "vi bør tjekke køreplanen før vi bestiller flybilletterne"),
    ("da", "biblioteket lukker tidligt om fredagen i vintermånederne"),
    ("da", "en lille hund gøede højt uden for kontorets vindue"),
    ("da", "alle var enige om at det andet forslag var mere realistisk"),
    ("da", "ingeniørerne testede broen i flere uger efter byggeriet"),
    ("da", "min søster havde friskt brød med fra bageriet rundt om hjørnet"),
    ("da", "udstillingen om gamle kort åbner på onsdag i næste uge"),
    ("da", "han slukkede lyset og låste hoveddøren"),
    ("da", "udvalget offentliggør de endelige resultater i begyndelsen af næste uge"),
    ("da", "den kraftige regn oversvømmede gaderne ved det gamle torv"),
    ("da", "hun skrev adressen ned på bagsiden af en kuvert"),
    # --- Finnish (round 5 widening) ---
    ("fi", "sää oli tänä aamuna kylmempi kuin kukaan oli odottanut"),
    ("fi", "hän luki pitkän raportin loppuun ennen kokouksen alkua"),
    ("fi", "naapurimme aikovat maalata talonsa ensi kesänä"),
    ("fi", "juna saapui kymmenen minuuttia myöhässä myrskyn takia"),
    ("fi", "hän ei muistanut minne oli jättänyt avaimet"),
    ("fi", "lapset leikkivät puutarhassa kunnes tuli pimeää"),
    ("fi", "tämä ravintola tarjoaa koko kaupungin parasta keittoa"),
    ("fi", "he päättivät kävellä kotiin sen sijaan että menisivät bussilla"),
    ("fi", "opettaja selitti tehtävän uudelleen uusille oppilaille"),
    ("fi", "meidän pitäisi tarkistaa aikataulu ennen lentolippujen varaamista"),
    ("fi", "kirjasto sulkeutuu aikaisin perjantaisin talvikuukausina"),
    ("fi", "pieni koira haukkui kovaa toimiston ikkunan ulkopuolella"),
    ("fi", "kaikki olivat samaa mieltä että toinen ehdotus oli realistisempi"),
    ("fi", "insinöörit testasivat siltaa useita viikkoja rakentamisen jälkeen"),
    ("fi", "siskoni toi tuoretta leipää kulman takana olevasta leipomosta"),
    ("fi", "näyttely vanhoista kartoista avautuu ensi keskiviikkona aamulla"),
    ("fi", "hän sammutti valot ja lukitsi etuoven"),
    ("fi", "komitea ilmoittaa lopulliset tulokset ensi viikon alussa"),
    ("fi", "rankkasade tulvi kadut vanhan torin lähellä"),
    ("fi", "hän kirjoitti osoitteen kirjekuoren taakse"),
    # --- Czech (round 5 widening) ---
    ("cs", "počasí bylo dnes ráno chladnější než všichni čekali"),
    ("cs", "dočetla dlouhou zprávu dřív než začala schůze"),
    ("cs", "naši sousedé chtějí příští léto natřít svůj dům"),
    ("cs", "vlak přijel o deset minut později kvůli bouřce"),
    ("cs", "nemohl si vzpomenout kde nechal klíče"),
    ("cs", "děti si hrály na zahradě dokud se nesetmělo"),
    ("cs", "tahle restaurace podává nejlepší polévku v celém městě"),
    ("cs", "rozhodli se jít domů pěšky místo autobusem"),
    ("cs", "učitel znovu vysvětlil úlohu novým žákům"),
    ("cs", "měli bychom zkontrolovat jízdní řád než koupíme letenky"),
    ("cs", "knihovna zavírá v pátek brzy během zimních měsíců"),
    ("cs", "malý pes hlasitě štěkal před oknem kanceláře"),
    ("cs", "všichni se shodli že druhý návrh byl realističtější"),
    ("cs", "inženýři testovali most několik týdnů po dokončení stavby"),
    ("cs", "moje sestra přinesla čerstvý chléb z pekárny za rohem"),
    ("cs", "výstava o starých mapách začíná příští středu ráno"),
    ("cs", "zhasl světla a zamkl vchodové dveře"),
    ("cs", "výbor oznámí konečné výsledky začátkem příštího týdne"),
    ("cs", "prudký déšť zaplavil ulice poblíž starého náměstí"),
    ("cs", "zapsala si adresu na zadní stranu obálky"),
    # --- Turkish (round 5 widening) ---
    ("tr", "bu sabah hava herkesin beklediğinden daha soğuktu"),
    ("tr", "toplantı başlamadan önce uzun raporu okumayı bitirdi"),
    ("tr", "komşularımız gelecek yaz evlerini boyamak istiyor"),
    ("tr", "tren fırtına yüzünden on dakika geç geldi"),
    ("tr", "anahtarları nereye bıraktığını hatırlayamıyordu"),
    ("tr", "çocuklar hava kararana kadar bahçede oynadı"),
    ("tr", "bu restoran bütün şehrin en iyi çorbasını sunuyor"),
    ("tr", "otobüse binmek yerine eve yürüyerek dönmeye karar verdiler"),
    ("tr", "öğretmen yeni öğrenciler için problemi bir kez daha açıkladı"),
    ("tr", "uçak biletlerini almadan önce tarifeyi kontrol etmeliyiz"),
    ("tr", "kütüphane kış aylarında cuma günleri erken kapanıyor"),
    ("tr", "küçük bir köpek ofisin penceresinin önünde yüksek sesle havlıyordu"),
    ("tr", "herkes ikinci önerinin çok daha gerçekçi olduğunda hemfikirdi"),
    ("tr", "mühendisler inşaattan sonra köprüyü haftalarca test etti"),
    ("tr", "kız kardeşim köşedeki fırından taze ekmek getirdi"),
    ("tr", "eski haritalar sergisi önümüzdeki çarşamba sabahı açılıyor"),
    ("tr", "ışıkları kapattı ve ön kapıyı kilitledi"),
    ("tr", "komite nihai sonuçları gelecek haftanın başında açıklayacak"),
    ("tr", "şiddetli yağmur eski pazar meydanının yakınındaki sokakları su bastı"),
    ("tr", "adresi bir zarfın arkasına yazdı"),
    # --- Romanian (round 5 widening) ---
    ("ro", "vremea de azi dimineață a fost mai rece decât se aștepta toată lumea"),
    ("ro", "ea a terminat de citit raportul lung înainte să înceapă ședința"),
    ("ro", "vecinii noștri vor să își vopsească casa vara viitoare"),
    ("ro", "trenul a ajuns cu zece minute întârziere din cauza furtunii"),
    ("ro", "nu își putea aminti unde lăsase cheile"),
    ("ro", "copiii s-au jucat în grădină până s-a întunecat"),
    ("ro", "acest restaurant servește cea mai bună supă din tot orașul"),
    ("ro", "au hotărât să meargă acasă pe jos în loc să ia autobuzul"),
    ("ro", "profesorul a explicat problema încă o dată pentru elevii noi"),
    ("ro", "ar trebui să verificăm orarul înainte să cumpărăm biletele de avion"),
    ("ro", "biblioteca se închide devreme vinerea în lunile de iarnă"),
    ("ro", "un câine mic lătra tare în fața ferestrei biroului"),
    ("ro", "toți au fost de acord că a doua propunere era mult mai realistă"),
    ("ro", "inginerii au testat podul timp de mai multe săptămâni după construcție"),
    ("ro", "sora mea a adus pâine proaspătă de la brutăria din colț"),
    ("ro", "expoziția despre hărți vechi se deschide miercurea viitoare dimineața"),
    ("ro", "el a stins luminile și a încuiat ușa de la intrare"),
    ("ro", "comitetul va anunța rezultatele finale la începutul săptămânii viitoare"),
    ("ro", "ploaia puternică a inundat străzile de lângă vechea piață"),
    ("ro", "ea a notat adresa pe spatele unui plic"),
]


def splits() -> tuple[list, list]:
    """(dev, test): first/last 10 sentences per language. Tuning may read
    dev; test is held out and is THE reported figure."""
    by_lang: dict[str, list] = {}
    for lang, text in HOLDOUT:
        by_lang.setdefault(lang, []).append((lang, text))
    dev = [x for lang in by_lang for x in by_lang[lang][:10]]
    test = [x for lang in by_lang for x in by_lang[lang][10:]]
    return dev, test


def measure(spark) -> dict:
    from bm25_spark.operators.textstats import lang_id

    dev, test = splits()
    in_test = {t for _, t in test}
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(HOLDOUT)],
        "doc_id long, lang string, text string",
    )
    joined = (
        df.join(lang_id(df), "doc_id")
        .select("lang", "text", "lang_pred")
        .collect()
    )
    buckets: dict[str, dict[str, list[int]]] = {"dev": {}, "test": {}}
    for r in joined:
        split = "test" if r["text"] in in_test else "dev"
        buckets[split].setdefault(r["lang"], []).append(
            1 if r["lang"] == r["lang_pred"] else 0
        )

    def acc(per_lang):
        total = sum(sum(v) for v in per_lang.values())
        n = sum(len(v) for v in per_lang.values())
        return round(total / n, 4), {
            lang: round(sum(v) / len(v), 3)
            for lang, v in sorted(per_lang.items())
        }

    dev_acc, dev_by = acc(buckets["dev"])
    test_acc, test_by = acc(buckets["test"])
    return {
        "metric": "lang_id_heldout_accuracy",
        "value": test_acc,
        "dev_accuracy": dev_acc,
        "n_test": sum(len(v) for v in buckets["test"].values()),
        "per_lang_test": test_by,
    }


if __name__ == "__main__":
    from bm25_spark.session import get_spark

    spark = get_spark(app="lid-accuracy", cores=8, shuffle_partitions=8,
                      driver_memory="8g")
    print(json.dumps(measure(spark)))
    spark.stop()
